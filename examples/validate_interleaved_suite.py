"""The north-rule flagship: per-partition constraint suite over an Iceberg-
style interleaved-document table — uniqueness, span invariant, referential
integrity to the media catalog, and distribution drift, with resumable
checkpointed metrics. (Mirrors how the reference's verification algorithms
are composed into a profiling run; spark-submit deployable, see
tools/submit_suite.py.)"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from desbordante_spark.plans.runner import Constraint, SuiteRunner
from desbordante_spark.sources.interleaved import (
    generate_documents,
    generate_media_catalog,
)


def main(spark, n_docs: int = 20_000) -> None:
    docs = generate_documents(spark, n_docs)
    catalog = generate_media_catalog(spark, max(100, n_docs // 10))
    ckpt = tempfile.mkdtemp(prefix="suite_ckpt_")
    runner = SuiteRunner(spark, checkpoint_dir=ckpt, snapshot_id="snap1",
                         partition_col="part_key")
    metrics = runner.run(
        docs,
        [
            Constraint("doc_id_unique", "uniqueness", {"columns": ["doc_id"]}),
            Constraint("spans_wellformed", "span", {}),
            Constraint(
                "media_refs", "referential",
                {"lhs": ["media_ref"], "rhs": ["media_ref"],
                 "rhs_table": "media_catalog",
                 "lhs_frame": lambda d: d.select(
                     "part_key",
                     F.explode(F.col("spans").getField("media_ref"))
                     .alias("media_ref"))},
            ),
            Constraint(
                "span_count_drift", "drift",
                {"value_col": "n_spans", "value_expr": F.size("spans"),
                 "discrete": True, "ks_threshold": 0.2},
            ),
        ],
        aux={"media_catalog": catalog},
    )
    failing = metrics.filter(F.col("holds") == 0)
    print(f"metrics rows: {metrics.count()}, failing partition-constraints: "
          f"{failing.count()}")
    for r in failing.orderBy("constraint", "partition").limit(8).collect():
        print(f"  [{r['constraint']}] {r['partition']}: "
              f"violations={r['num_violating_rows']} error={r['error']:.5f}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-suite"))
