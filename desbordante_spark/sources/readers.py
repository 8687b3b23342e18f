"""Input sources mirroring the reference's ingestion surface.

Reference (/root/reference):
- CSV scan: ``CSVParser(path, separator, has_header)`` — quote ``"``, escape
  ``\\``, rows with wrong arity skipped with a warning
  (src/core/parser/csv_parser/csv_parser.h:21-73; arity-skip at
  model/table/column_layout_relation_data.cpp:35-39). Header-less files get
  synthesized ordinal column names.
- pandas DataFrame scan: ``load_data(table=df)`` with ``pandas.isna`` null
  detection (src/python_bindings/py_util/dataframe_reader.h:17-55).
- Multi-table scan: IND algorithms take a list of tables
  (src/core/algorithms/ind/ind_algorithm.h:37).

Spark mapping: ``spark.read.csv`` with DROPMALFORMED ≙ the arity-skip;
``spark.createDataFrame`` (Arrow) ≙ the pandas reader; a dict of DataFrames
≙ the table list. The reference re-infers types from strings per column
(typed_column_data.cpp:24-81) — here ``infer_schema=True`` delegates that to
Spark's CSV inference, or pass an explicit schema (the production path:
Iceberg/Parquet carry their schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_csv", "from_pandas", "read_tables", "spread_small_input",
           "spread_small_input_by"]


def spread_small_input(df: DataFrame) -> DataFrame:
    """Scale-adaptive input parallelization for compute-heavy per-row
    operators (tokenization, rolling n-grams, per-pair distance folds).

    A small table written as one parquet file with one row group scans as
    ONE task no matter the split-size conf (row groups are the split
    granularity), serializing all downstream per-row work on a single core.
    When the input yields fewer partitions than the session's default
    parallelism, round-robin repartition up to it — the shuffle moves only
    the operator's (already projected) input once, and the explicit
    partition count is exempt from AQE coalescing. At production scale the
    scan fans out past the core count and this is a no-op, so no shuffle is
    ever added where the layout is already parallel.
    """
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if _effective_parallelism(df, target) < target:
        return df.repartition(target)
    return df


def _effective_parallelism(df: DataFrame, target: int) -> int:
    """Best-effort *effective* scan parallelism.

    ``rdd.getNumPartitions()`` overcounts on small parquet inputs: Spark
    happily makes ``minPartitionNum`` size-based splits of a single file,
    but the row group is the real split granularity — a one-row-group file
    yields one non-empty task no matter how many splits cover it. For
    parquet file sources, count row groups from the footers (stopping at
    ``target``); otherwise fall back to the partition count.
    """
    try:
        files = df.inputFiles()
    except Exception:
        files = None
    if files:
        if len(files) >= target:
            return len(files)
        groups = 0
        for f in files:
            if ".parquet" not in f:
                groups = None
                break
            if f.startswith("file://"):
                path = f[7:]
            elif f.startswith("file:"):
                path = f[5:]
            else:
                groups = None
                break
            try:
                import pyarrow.parquet as pq

                groups += pq.ParquetFile(path).num_row_groups
            except Exception:
                groups = None
                break
            if groups >= target:
                break
        if groups is not None:
            return groups
    return df.rdd.getNumPartitions()


def spread_small_input_by(df: DataFrame, cols) -> DataFrame:
    """By-key variant of :func:`spread_small_input` for aggregation/window
    operators whose grouping keys do not compress under partial aggregation
    (uniqueness checks, per-context windows): repartition by ``cols`` when
    the input is under-parallel. The resulting HashPartitioning satisfies
    every downstream clustering requirement on these keys (or a superset),
    so Spark plans NO further exchange — one shuffle replaces the serial
    partial-agg + exchange pair. No-op at production parallelism; callers
    must project to the needed columns first so the exchange carries only
    them. (Round-robin was measured strictly worse here: its mandatory
    sort-before-repartition pays more than the parallelism gain.)
    """
    cols = list(cols)
    if df.isStreaming or not cols:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if _effective_parallelism(df, target) < target:
        from pyspark.sql import functions as F

        return df.repartition(target, *[F.col(c) for c in cols])
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    separator: str = ",",
    has_header: bool = True,
    infer_schema: bool = False,
    schema: str | None = None,
) -> DataFrame:
    """CSV source with the reference's parsing semantics."""
    reader = (
        spark.read.option("sep", separator)
        .option("header", str(has_header).lower())
        .option("quote", '"')
        .option("escape", "\\")
        .option("mode", "DROPMALFORMED")
    )
    if schema:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if not has_header:
        # synthesized ordinal names, matching csv_parser.cpp:43-51
        df = df.toDF(*[f"col{i}" for i in range(len(df.columns))])
    return df


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """pandas DataFrame source (Arrow-batched transfer)."""
    return spark.createDataFrame(pdf)


def read_tables(
    spark: SparkSession, paths: dict[str, str], fmt: str = "parquet"
) -> dict[str, DataFrame]:
    """Multi-table scan: name → DataFrame (the IND algorithms' table list)."""
    return {
        name: spark.read.format(fmt).load(path) for name, path in paths.items()
    }
