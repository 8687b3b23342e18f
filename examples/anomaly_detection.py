"""Drift / anomaly detection — mirrors /root/reference/examples/
anomaly_detection.py intent: compare each partition's value distribution to
the rest of the table with KS + chi² over histogram sketches, plus algebraic
range exceptions."""

from __future__ import annotations

from desbordante_spark.operators.ac import ac_exceptions
from desbordante_spark.operators.drift import drift_metrics, histogram_sketch


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    sketch = histogram_sketch(events, "value", "event_type",
                              bucket_width=10.0)
    for r in drift_metrics(sketch, ks_threshold=0.1).collect():
        flag = "DRIFTED" if r["drifted"] else "ok"
        print(f"  {r['partition']}: ks={r['ks_stat']:.4f} "
              f"chi2={r['chi2_stat']:.1f} [{flag}]")

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exc = ac_exceptions(lineitem, "l_extendedprice", "l_quantity", "/",
                        ranges=[(500.0, 1500.0)])
    print(f"rows whose price/qty falls outside [500, 1500]: {exc.count()}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-anomaly"))
