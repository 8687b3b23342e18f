"""Unary IND / AIND discovery across tables (Spider equivalent).

Reference: Spider materializes each column's sorted distinct value domain
(spilling to disk under ``mem_limit``) and prunes non-inclusions with a k-way
priority-queue merge (/root/reference/src/core/algorithms/ind/spider/
spider.cpp:66-103; domains model/table/column_domain.h:26-77). AIND error =
missing distinct-value fraction (spider.cpp:115-121).

Spark-first: the k-way merge is replaced by ONE union + double aggregation.
All candidate columns' distinct values are tagged with their column id and
unioned; grouping by value collects the set of columns containing it; a
second aggregation counts, per (lhs, rhs) pair, how many of lhs's distinct
values also appear in rhs. Every unary IND/AIND among N columns is answered
by one job — no pairwise loops, no sorted merges (Spark's shuffle does the
value co-location), spilling handled by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["discover_unary_inds"]


def discover_unary_inds(
    tables: dict[str, DataFrame],
    columns: dict[str, list[str]] | None = None,
    max_error: float = 0.0,
    cast_to: str = "string",
) -> DataFrame:
    """All unary INDs (``max_error=0``) or AINDs among the given columns.

    Output: ``(lhs, rhs, lhs_distinct, overlap, error, holds)`` for every
    ordered pair with ``error <= max_error``; ``lhs``/``rhs`` are
    ``table.column`` strings. Values are compared under a common cast
    (``cast_to``), mirroring Spider's string-typed domains.
    """
    parts = []
    names = []
    for tname, df in tables.items():
        cols = (columns or {}).get(tname, df.columns) if columns else df.columns
        for c in cols:
            cid = f"{tname}.{c}"
            names.append(cid)
            parts.append(
                df.select(
                    F.col(c).cast(cast_to).alias("v"),
                    F.lit(cid).alias("col_id"),
                )
                .filter(F.col("v").isNotNull())
                .distinct()
            )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    # per value: which columns contain it
    by_value = u.groupBy("v").agg(F.collect_set("col_id").alias("cols"))
    # per (lhs in cols, rhs in cols) pair: co-occurrence counts
    pair = by_value.select(
        F.explode("cols").alias("lhs"), F.col("cols")
    ).select("lhs", F.explode("cols").alias("rhs"))
    counts = pair.groupBy("lhs", "rhs").agg(F.count(F.lit(1)).alias("overlap"))
    totals = counts.filter(F.col("lhs") == F.col("rhs")).select(
        F.col("lhs").alias("l2"), F.col("overlap").alias("lhs_distinct")
    )
    out = (
        counts.filter(F.col("lhs") != F.col("rhs"))
        .join(F.broadcast(totals), F.col("lhs") == F.col("l2"))
        .select(
            "lhs",
            "rhs",
            "lhs_distinct",
            "overlap",
            (
                1.0
                - F.col("overlap").cast("double")
                / F.col("lhs_distinct").cast("double")
            ).alias("error"),
        )
        .withColumn("holds", (F.col("error") <= F.lit(max_error)).cast("int"))
    )
    return out.filter(F.col("error") <= F.lit(max_error)).orderBy("lhs", "rhs")
