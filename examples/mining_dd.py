"""Differential dependencies — mirrors /root/reference/examples/mining_dd.py:
the FAITHFUL Split search (difference-table candidate spaces →
instance-exclusion reduce → minimal cover), the engine's corpus-scale RHS
bound mining, then verification (banded equi-self-join, never a cross
join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.discovery.split import dd_build_rhs_ranges, discover_dds
from desbordante_spark.discovery.split_search import discover_dds_split
from desbordante_spark.operators.dd import dd_verify, dd_violations


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")

    # --- faithful Split search (reference mining_dd.py walkthrough) ---
    slice_df = (
        supplier.orderBy("s_suppkey").limit(25)
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .withColumn("s_acctbal", F.round("s_acctbal", 0))
    )
    res = discover_dds_split(
        slice_df,
        difference_constraints={
            "s_nationkey": [(0.0, 0.0), (0.0, 5.0)],
            "s_acctbal": [(0.0, 100.0), (0.0, 2000.0)],
        },
        row_id="s_suppkey",
    )
    print(f"faithful Split minimal cover ({res.num_distinct_vectors} "
          f"distinct distance vectors over {res.num_pairs} pairs):")
    for dd in res.dds:
        print(f"  {dd}")

    # --- discovery (reference Split: mine difference functions) ---
    mined = discover_dds(
        supplier, {"s_acctbal": (0.0, 100.0)}, ["s_nationkey", "s_name"],
        row_id="s_suppkey",
    ).collect()
    print("mined DDs for |Δs_acctbal| <= 100:")
    for r in mined:
        print(f"  -> |Δ{r['rhs_col']}| ∈ [{r['lo']}, {r['hi']}] "
              f"({r['num_pairs']} pairs, holds={bool(r['holds'])})")
    ranges = dd_build_rhs_ranges(
        supplier, {"s_acctbal": (0.0, 100.0)}, "s_nationkey",
        row_id="s_suppkey",
    )
    print(f"gap-split RHS intervals for s_nationkey: {ranges}")
    # "suppliers with account balances within 100 must be within 5 nations"
    res = dd_verify(
        supplier, {"s_acctbal": (0.0, 100.0)}, "s_nationkey", 0.0, 5.0,
        row_id="s_suppkey",
    )
    print(f"DD holds: {res.holds} — {res.num_violating_clusters} of "
          f"{res.total_rows} qualifying pairs violate "
          f"(error {res.error:.4f})")
    for r in dd_violations(
        supplier, {"s_acctbal": (0.0, 100.0)}, "s_nationkey", 0.0, 5.0,
        row_id="s_suppkey",
    ).limit(3).collect():
        print(f"  pair ({r['id_a']}, {r['id_b']}): nation distance "
              f"{r['rhs_distance']:.0f}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-dd"))
