"""Set-based OD discovery — mirrors /root/reference/examples/
mining_set_od_1.py / _2.py: which order dependencies hold, under which
context column-sets and directions — every candidate evaluated in ONE
batched Spark job, plus the Fastod AUTOMATIC context-lattice search with
minimality pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.discovery.order import discover_ods, discover_ods_auto


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # --- automatic context-lattice search (mining_set_od_2.py semantics):
    # charge = price*(1+tax) is ordered by price only within a fixed tax
    # rate; the miner must discover the minimal context {l_tax} and prune
    # its supersets
    li = lineitem.select(
        "l_returnflag", "l_tax", "l_extendedprice",
        (F.col("l_extendedprice") * (F.lit(1.0) + F.col("l_tax")))
        .alias("charge"),
    )
    auto = discover_ods_auto(
        li, ["charge", "l_extendedprice"], ["l_returnflag", "l_tax"],
        max_context=2, directions=("asc",),
    ).collect()
    print("auto context-lattice candidates (pruned to minimal contexts):")
    for r in sorted(auto, key=lambda r: (r["context"], r["lhs"])):
        ctx = r["context"] or "(global)"
        print(f"  [{ctx}] {r['lhs']}↑ orders {r['rhs']}↑ -> "
              f"holds={bool(r['holds'])} ({r['num_swap_groups']} swap groups)")
    out = discover_ods(
        lineitem,
        columns=["l_linenumber", "l_quantity", "l_extendedprice"],
        context_candidates=[["l_orderkey"], []],
    )
    rows = out.collect()
    held = [r for r in rows if r["holds"]]
    print(f"{len(held)} of {len(rows)} OD candidates hold:")
    for r in sorted(held, key=lambda r: (r["context"], r["lhs"]))[:10]:
        ctx = r["context"] or "(global)"
        arrow = "↑" if r["direction"] == "asc" else "↓"
        print(f"  [{ctx}] {r['lhs']}↑ orders {r['rhs']}{arrow} "
              f"({r['total_groups']} groups)")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-set-od"))
