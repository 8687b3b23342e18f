"""spark-submit entrypoint for the validation suite.

North-rule deployment shape (BASELINE.json): the engine is launched via
``spark-submit --py-files`` on a multi-executor cluster. Package the library
and submit:

    cd /root/repo && zip -r /tmp/desbordante_spark.zip desbordante_spark
    spark-submit --py-files /tmp/desbordante_spark.zip \
        tools/submit_suite.py \
        --input  <path-or-iceberg-table of interleaved docs> \
        --catalog <path of media catalog> \
        --checkpoint <dir> --snapshot <iceberg snapshot id> \
        [--partition-col part_key] [--shuffle-partitions 2048]

Reads Iceberg when the input looks like a table name (``spark.table``),
parquet otherwise; runs the standard doc-suite (uniqueness + span invariant
+ referential + drift) with per-partition verdicts, appends lineage+metrics
rows to the checkpoint, resumes automatically under the same snapshot id,
and prints a JSON verdict summary.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--partition-col", default="part_key")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--ks-threshold", type=float, default=0.15)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from desbordante_spark.plans.runner import Constraint, SuiteRunner

    spark = SparkSession.builder.appName("desbordante-spark-suite").getOrCreate()
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(args.shuffle_partitions))

    def read(path: str):
        if "/" not in path and not path.endswith(".parquet"):
            return spark.table(path)  # Iceberg / catalog table
        return spark.read.parquet(path)

    docs = read(args.input)
    catalog = read(args.catalog)

    suite = [
        Constraint("doc_id_unique", "uniqueness", {"columns": ["doc_id"]},
                   shuffle_partitions=args.shuffle_partitions),
        Constraint("span_wellformed", "span", {}),
        Constraint(
            "media_refs_resolve",
            "referential",
            {
                # field-first explode → nested pruning: only the media_ref
                # subfield is read from the span structs
                "lhs_frame": lambda df: df.select(
                    args.partition_col,
                    F.explode(F.col("spans").getField("media_ref")).alias(
                        "media_ref"
                    ),
                ),
                "lhs": ["media_ref"],
                "rhs_table": "media_catalog",
                "rhs": ["media_ref"],
            },
        ),
        Constraint(
            "span_count_drift",
            "drift",
            {"value_col": "n_spans", "value_expr": F.size("spans"),
             "discrete": True, "ks_threshold": args.ks_threshold},
        ),
    ]
    runner = SuiteRunner(spark, args.checkpoint, args.snapshot,
                         args.partition_col)
    out = runner.run(docs, suite, aux={"media_catalog": catalog},
                     resume=not args.no_resume)
    rows = out.collect()
    summary = {}
    for r in rows:
        s = summary.setdefault(
            r["constraint"],
            {"partitions": 0, "failing": 0, "violating_rows": 0},
        )
        s["partitions"] += 1
        s["failing"] += 1 - r["holds"]
        s["violating_rows"] += r["num_violating_rows"] or 0
    print(json.dumps({"snapshot": args.snapshot, "run_id": runner.run_id,
                      "constraints": summary}))
    sys.exit(0 if all(s["failing"] == 0 for s in summary.values()) else 3)


if __name__ == "__main__":
    main()
