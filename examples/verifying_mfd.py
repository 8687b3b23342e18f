"""Metric FD verification — mirrors /root/reference/examples/verifying_mfd.py:
does every customer's order total stay within δ of the others? Includes the
per-point highlights (furthest point + max distance)."""

from __future__ import annotations

from desbordante_spark.operators.mfd import mfd_highlights, mfd_verify


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for delta in (400_000.0, 50_000.0):
        res = mfd_verify(orders, ["o_custkey"], ["o_totalprice"],
                         parameter=delta)
        print(f"MFD o_custkey ->({delta:,.0f}) o_totalprice holds: "
              f"{res.holds} (violating clusters: "
              f"{res.num_violating_clusters})")
    h = mfd_highlights(orders, ["o_custkey"], ["o_totalprice"],
                       parameter=50_000.0, evidence_cap=3).limit(5).collect()
    for r in h:
        mark = "X" if r["exceeds"] else "✓"
        print(f"  [{mark}] cluster {r['o_custkey']}: point={r['point']:.2f} "
              f"furthest={r['furthest_point']:.2f} "
              f"max_dist={r['max_distance']:.2f}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-mfd"))
