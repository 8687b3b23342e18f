"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and the matching
``oracle_sql()`` on DuckDB over the same parquet, then compares row count,
column names, and (column-name-sorted, row-sorted) values. Exits non-zero on
any mismatch. Usage: python tools/check_oracle.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def compare(name, spark_df, con, sql) -> list[str]:
    problems = []
    srows = spark_df.collect()
    scols = sorted(spark_df.columns)
    ores = con.sql(sql)
    ocols = sorted(ores.columns)
    orows = ores.fetchall()
    ocol_idx = [ores.columns.index(c) for c in ocols]
    if scols != ocols:
        problems.append(f"schema: spark={scols} oracle={ocols}")
    if len(srows) != len(orows):
        problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if problems:
        return problems
    sv = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
    ov = sorted(tuple(norm(r[i]) for i in ocol_idx) for r in orows)
    if sv != ov:
        diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
        problems.append(f"values differ; first diffs: {diffs}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from desbordante_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.Error:
            pass

    qs, os_ = e.queries(), e.oracle_sql()
    failed = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        if name not in os_:
            print(f"  {name}: NO ORACLE (rows-only check)")
            try:
                n = fn(spark, sf_dir).count()
                print(f"    rows={n}")
            except Exception as ex:
                print(f"    SPARK ERROR: {ex}")
                failed.append(name)
            continue
        try:
            problems = compare(name, fn(spark, sf_dir), con, os_[name])
        except Exception as ex:
            problems = [f"exception: {type(ex).__name__}: {str(ex)[:500]}"]
        if problems:
            failed.append(name)
            print(f"  {name}: FAIL")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"  {name}: OK")
    print(f"\n{checked - len(failed)}/{checked} matched"
          + ("" if not only else f" (subset of {len(qs)} registered)"))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
