"""Build a synthetic larger-SF dataset by replicating an existing SF dir
K times with key offsets (measurement-only — approximates the driver's
sf1.0 tables so optimizations are validated at the scale the driver
actually times; never used by bench.py or any declared query).

Usage: python tools/make_sf_synth.py [src_dir] [dst_dir] [k]
Default: /root/testdata/sf0.1 -> /tmp/sf1_synth, k=10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# integer id columns to offset per replica so key cardinality scales too
_OFFSET_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}

TABLES = ["lineitem", "orders", "customer", "events", "documents",
          "embeddings", "supplier", "part", "nation", "region"]


def main() -> None:
    from desbordante_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="make-sf-synth")
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        path = f"{src}/{name}.parquet"
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name in ("nation", "region"):
            df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
            continue
        offs = [c for c in _OFFSET_COLS.get(name, []) if c in df.columns]
        spans = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in offs}
        reps = spark.range(k).withColumnRenamed("id", "_rep")
        big = df.crossJoin(reps)
        for c in offs:
            big = big.withColumn(
                c, (F.col(c) + F.col("_rep") * F.lit(spans[c])).cast(
                    dict(df.dtypes)[c])
            )
        # single output file: mirrors the driver testdata layout (one file,
        # one row group — scans as ONE task), which is what optimizations
        # must hold against
        big.drop("_rep").coalesce(1).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        print(f"{name}: x{k} -> {dst}/{name}.parquet")


if __name__ == "__main__":
    main()
