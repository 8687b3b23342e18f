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
    null_value: str | None = None,
    equal_nulls: bool = True,
) -> DataFrame:
    """All unary INDs (``max_error=0``) or AINDs among the given columns.

    Output: ``(lhs, rhs, lhs_distinct, overlap, error, holds)`` for every
    ordered pair with ``error <= max_error``; ``lhs``/``rhs`` are
    ``table.column`` strings. Values are compared under a common cast
    (``cast_to``), mirroring Spider's string-typed domains.

    ``null_value`` enables the reference's CSV null semantics (the parser
    maps only the EMPTY cell to null, column_layout_relation_data.cpp:
    43-44; pass ``""`` for tables loaded with literal empty strings):
    columns consisting ENTIRELY of ``null_value`` are excluded outright
    (column_domain.cpp:283-291), and with ``equal_nulls=False`` every
    null forms its own singleton merge group (spider.cpp:80). Under
    ``max_error=0`` a singleton null cluster can never be covered, so a
    null-bearing column yields no exact INDs as an LHS and is excluded
    outright; under ``max_error>0`` (AIND) the null clusters merely ADD
    error — each null row counts as one unmatched singleton cluster in
    the error denominator (``error = 1 - overlap / (lhs_distinct +
    lhs_null_rows)``) and nulls never match as RHS values.
    ``equal_nulls=True`` treats null as one ordinary domain value.
    ``null_value=None`` (default) keeps the engine's SQL semantics: NULL
    rows are dropped from domains on both sides.
    """
    parts = []
    names = []
    for tname, df in tables.items():
        cols = (columns or {}).get(tname, df.columns) if columns else df.columns
        for c in cols:
            cid = f"{tname}.{c}"
            names.append(cid)
            v = F.col(c).cast(cast_to)
            if null_value is not None:
                v = F.coalesce(v, F.lit(null_value))
            part = df.select(v.alias("v"), F.lit(cid).alias("col_id"))
            if null_value is None:
                part = part.filter(F.col("v").isNotNull())
            parts.append(part.distinct())
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    lhs_excluded: set[str] = set()
    null_rows: dict[str, int] = {}
    if null_value is not None:
        # one tiny job over the distinct-value union: which columns carry
        # the null token, which are nothing but it
        flags = {
            r["col_id"]: (int(r["nulls"]), int(r["n"]))
            for r in u.groupBy("col_id").agg(
                F.sum((F.col("v") == null_value).cast("int")).alias("nulls"),
                F.count(F.lit(1)).alias("n"),
            ).collect()
        }
        all_null = {c for c, (nn, n) in flags.items() if nn == n}
        u = u.filter(~F.col("col_id").isin(sorted(all_null)))
        if not equal_nulls:
            u = u.filter(F.col("v") != null_value)
            if max_error == 0:
                # exact INDs: one uncoverable singleton null cluster is
                # already fatal for the LHS
                lhs_excluded = {c for c, (nn, _n) in flags.items() if nn > 0}
            else:
                # AIND: each null ROW is one unmatched singleton cluster —
                # count rows (not distinct tokens) per null-bearing column,
                # one tiny aggregate per table
                for tname, df in tables.items():
                    tcols = (
                        (columns or {}).get(tname, df.columns)
                        if columns
                        else df.columns
                    )
                    tcols = [
                        c
                        for c in tcols
                        if f"{tname}.{c}" in flags
                        and flags[f"{tname}.{c}"][0] > 0
                        and f"{tname}.{c}" not in all_null
                    ]
                    if not tcols:
                        continue
                    row = df.agg(*[
                        F.sum(
                            (
                                F.coalesce(
                                    F.col(c).cast(cast_to),
                                    F.lit(null_value),
                                )
                                == null_value
                            ).cast("long")
                        ).alias(c)
                        for c in tcols
                    ]).collect()[0]
                    for c in tcols:
                        null_rows[f"{tname}.{c}"] = int(row[c])
        lhs_excluded |= all_null
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
    if null_rows:
        # AIND error denominator = distinct non-null clusters + the LHS's
        # singleton null clusters (tiny literal map, pure expression)
        nr = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in sorted(null_rows.items()) for x in kv]
                ),
                F.col("lhs"),
            ).cast("double"),
            F.lit(0.0),
        )
    else:
        nr = F.lit(0.0)
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
                / (F.col("lhs_distinct").cast("double") + nr)
            ).alias("error"),
        )
        .withColumn("holds", (F.col("error") <= F.lit(max_error)).cast("int"))
    )
    if lhs_excluded:
        out = out.filter(~F.col("lhs").isin(sorted(lhs_excluded)))
    return out.filter(F.col("error") <= F.lit(max_error)).orderBy("lhs", "rhs")
