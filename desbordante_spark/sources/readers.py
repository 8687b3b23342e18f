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

__all__ = ["read_csv", "from_pandas", "read_tables"]


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
