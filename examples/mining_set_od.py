"""Set-based OD discovery — mirrors /root/reference/examples/
mining_set_od_1.py / _2.py: which order dependencies hold, under which
context column-sets and directions — every candidate evaluated in ONE
batched Spark job."""

from __future__ import annotations

from desbordante_spark.discovery.order import discover_ods


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
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
