"""IND discovery — mirrors /root/reference/examples/mining_ind.py: unary
inclusion dependencies across tables (Spider, one union + double-agg job),
then n-ary discovery on top (Mind, one batched job per level)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.discovery.mind import discover_nary_inds
from desbordante_spark.discovery.spider import discover_unary_inds


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    tables = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in ("region", "nation", "customer", "supplier")
    }
    cols = {
        "region": ["r_regionkey"],
        "nation": ["n_nationkey", "n_regionkey"],
        "customer": ["c_custkey", "c_nationkey"],
        "supplier": ["s_suppkey", "s_nationkey"],
    }
    unary = discover_unary_inds(tables, cols, max_error=0.0)
    print("unary INDs:")
    for r in unary.collect():
        print(f"  {r['lhs']} ⊆ {r['rhs']}")

    # n-ary: a projected sample of orders is included in orders by
    # construction — Mind finds the arity-2 IND and its projections
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sample = orders.filter(F.col("o_orderkey") % 7 == 0)
    nary = discover_nary_inds(
        {"orders_sample": sample, "orders": orders},
        {"orders_sample": ["o_custkey", "o_orderpriority"],
         "orders": ["o_custkey", "o_orderpriority"]},
        max_arity=2,
    )
    print("n-ary INDs:")
    for r in nary.collect():
        print(f"  {r['lhs']} ⊆ {r['rhs']}  (arity {r['arity']})")

    # Faida scale path: HLL sketch prune per level + exact confirmation of
    # survivors — identical result set, no exact distinct job for the
    # candidates the sketch rules out
    approx = discover_nary_inds(
        {"orders_sample": sample, "orders": orders},
        {"orders_sample": ["o_custkey", "o_orderpriority"],
         "orders": ["o_custkey", "o_orderpriority"]},
        max_arity=2, approx=True,
    )
    print(f"Faida-pruned n-ary discovery: {approx.count()} INDs "
          "(same set as exact Mind)")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-mine-ind"))
