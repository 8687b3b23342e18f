"""Conditional FDs — mirrors /root/reference/examples/mining_cfd.py: MINE
itemset CFD rules with cfd_minsup / cfd_minconf / cfd_max_lhs (FDFirst
most-frequent-RHS semantics), then verify a pattern tableau."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.discovery.cfd_miner import discover_cfds
from desbordante_spark.operators.cfd import (
    cfd_tableau_metrics_df,
    cfd_tableau_verify,
)


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # --- discovery (reference: algo.execute(cfd_minsup=..., cfd_minconf=...,
    # cfd_max_lhs=...); result = algo.get_cfds()) ---
    mined = discover_cfds(
        orders.select(
            "o_orderstatus", "o_orderpriority",
            F.col("o_orderdate").cast("string").substr(1, 4).alias("o_year"),
        ),
        ["o_orderstatus", "o_orderpriority", "o_year"],
        min_support=20, min_confidence=0.8, max_lhs=2,
    ).orderBy(F.col("confidence").desc(), "lhs_pattern").collect()
    print(f"{len(mined)} CFD rules (minsup=20, minconf=0.8, max_lhs=2); "
          "first five:")
    for r in mined[:5]:
        print(f"  ({r['lhs_pattern']}) -> {r['rhs']}  "
              f"support={r['support']} confidence={r['confidence']:.4f}")
    tableau = [
        {"o_orderstatus": "F"},
        {"o_orderstatus": "O"},
        {"o_orderstatus": "P"},
    ]
    rows = cfd_tableau_metrics_df(
        orders, ["o_custkey"], ["o_orderpriority"], tableau,
        error_threshold=0.001, min_support=50,
    ).collect()
    print("pattern tableau for (o_custkey -> o_orderpriority):")
    for r in rows:
        print(f"  [{r['pattern']}] support={r['support']} "
              f"confidence={r['confidence']:.5f} holds={bool(r['holds'])}")

    combined = cfd_tableau_verify(
        orders, ["o_custkey"], ["o_orderpriority"], tableau,
        error_threshold=0.001, min_support=50,
    )
    print(f"CFD (all tableau rows) holds: {combined.holds}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-cfd"))
