"""Optimization-round measurement harness (guide §1): isolates single
queries with the noop sink, prints per-query timings, and can dump
``explain("formatted")`` plans to plans/r07/.

Usage:
  python bench_extra.py time <query> [query ...]   # min-of-k noop timings
  python bench_extra.py plan <query> [query ...]   # dump formatted plans
  python bench_extra.py all                        # time every bench query

Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_BENCH_REPS (default 3),
SPARK_GRAFT_PLAN_SUFFIX (e.g. "before"/"after" for plan file names).

This file is NOT the driver bench (bench.py is frozen); numbers here are
cited in OPTIMIZATION_r07.md only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r07")

BENCH_QUERIES = [
    "ucc_metrics_lineitem_pk",
    "fd_metrics_orders",
    "afd_metrics_lineitem",
    "ind_metrics_lineitem_orders",
    "stats_profile_lineitem",
    "stats_profile_lineitem_approx",
    "od_violations_lineitem",
    "mfd_violations_orders",
    "drift_events_by_type",
    "top_words_documents",
    "minhash_documents",
    "simhash_documents",
    "fingerprint_documents",
    "lang_id_documents",
    "ann_topk_embeddings",
]


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from desbordante_spark.session import get_spark

    import __spark_entry__ as entrymod

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2:]
    if mode == "all" or not names:
        names = BENCH_QUERIES

    spark = get_spark(
        app_name="desbordante-spark-bench-extra",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    qs = entrymod.queries()

    if mode == "plan":
        os.makedirs(PLAN_DIR, exist_ok=True)
        suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "plan")
        for name in names:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")
        return

    # warmup + interleaved min-of-k (CLAUDE.md: host has 5-10x stalls)
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        _force(qs[name](spark, SF_DIR))
    for _rep in range(max(1, REPS)):
        for name in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"time:{name}")
            t = time.monotonic()
            _force(qs[name](spark, SF_DIR))
            dt = time.monotonic() - t
            timings[name] = min(timings.get(name, float("inf")), dt)
    print(json.dumps({k: round(v, 3) for k, v in timings.items()}))


if __name__ == "__main__":
    main()
