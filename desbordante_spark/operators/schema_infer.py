"""Schema/type inference over string columns — the reference's typed-column
deduction as ONE Spark aggregation pass.

Reference: every CSV cell arrives as a string; per column the reference
narrows a 5-candidate bitset [Date, Int, BigInt, Double, String] value by
value and deduces the column type as the first surviving candidate, or
``mixed`` when the intersection empties, or ``undefined`` for all-null
(/root/reference/src/core/model/table/typed_column_data.cpp:24-81
``DeduceColumnType``; value checkers + per-value candidate bitsets at
typed_column_data.h:176-240: Int ``^[+-]?\\d{1,19}$`` → {Int, BigInt,
Double}, BigInt ``^[+-]?\\d{20,}$`` → {BigInt, Double}, Double (full-string
``stod``) → {Double}, delimited date → {Date}, undelimited date → {Date,
Int, BigInt, Double}, anything else → {String}; nulls — the ``NULL``
literal, builtin.h:35 — and empties are excluded from deduction). The
per-type row partitioning of ``CreateTypeMap`` (typed_column_data.cpp:85-110)
becomes per-type value counts here.

Spark-first: the bitset-AND over values is a ``bit_and`` aggregate over a
per-value candidate mask computed by regex — pure column expressions, every
column of a table profiled in ONE exploded two-level-free aggregation job
(the stats.py unpivot shape: no Expand, no UDF). The same regexes run
verbatim in DuckDB/ANSI engines, so verdicts are engine-exact.

Deviations from the reference, documented: ``stod``'s exotic accepts
(hexfloat, inf/nan) are not treated as doubles — the double class is
``^[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$`` minus the int/bigint
classes; date validity is structural (YYYY-MM-DD / YYYYMMDD with month
01-12, day 01-31), not calendar-checked (boost would reject Feb 30). The
reference's value-classification order is an ``unordered_map`` iteration —
here it is the deterministic precedence date → int → bigint → double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["type_profile", "TYPE_BITS"]

#: candidate bits, low bit = highest deduction priority
#: (typed_column_data.h:235-240 kTypeIdToBitset, same order)
TYPE_BITS = {"date": 1, "int": 2, "bigint": 4, "double": 8, "string": 16}
_ALL = 31

_RE_INT = r"^[+-]?[0-9]{1,19}$"
_RE_BIGINT = r"^[+-]?[0-9]{20,}$"
_RE_DOUBLE = r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$"
#: boost from_simple_string accepts -, / and . delimiters and 1-digit
#: month/day (test_typed_column_data.cpp goldens: 2007/12/31, 2012.12.12,
#: 2019-1-12 all deduce kDate)
_RE_DATE_DELIM = (
    r"^[0-9]{4}[-/.](0?[1-9]|1[0-2])[-/.](0?[1-9]|[12][0-9]|3[01])$"
)
_RE_DATE_UNDELIM = r"^[0-9]{4}(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])$"


def _value_class(v):
    """Disjoint value class, reference checker precedence made
    deterministic. ``v`` must be a string column expression. Dates are
    calendar-checked like boost::gregorian (non-leap Feb 29 rejected,
    years below 1400 out of range — test_typed_column_data.cpp goldens
    '1900-02-29' / '1399-12-31' deduce String): the structural regex gates
    the shape, then a ``try_cast`` of the dash-normalized form validates
    the calendar identically in Spark and DuckDB."""
    norm = F.translate(v, "/.", "--")
    delim_date = (
        v.rlike(_RE_DATE_DELIM)
        & norm.try_cast("date").isNotNull()
        & (F.substring(norm, 1, 4) >= "1400")
    )
    unorm = F.concat_ws(
        "-",
        F.substring(v, 1, 4),
        F.substring(v, 5, 2),
        F.substring(v, 7, 2),
    )
    undelim_date = (
        v.rlike(_RE_DATE_UNDELIM)
        & unorm.try_cast("date").isNotNull()
        & (F.substring(v, 1, 4) >= "1400")
    )
    return (
        F.when(delim_date, F.lit("date"))
        .when(undelim_date, F.lit("udate"))
        .when(v.rlike(_RE_INT), F.lit("int"))
        .when(v.rlike(_RE_BIGINT), F.lit("bigint"))
        .when(v.rlike(_RE_DOUBLE), F.lit("double"))
        .otherwise(F.lit("string"))
    )


#: per-class candidate masks (typed_column_data.h:235-240; undelimited
#: dates add the numeric bits — typed_column_data.cpp:52-56)
_CLASS_MASK = {
    "date": TYPE_BITS["date"],
    "udate": TYPE_BITS["date"] | TYPE_BITS["int"] | TYPE_BITS["bigint"]
    | TYPE_BITS["double"],
    "int": TYPE_BITS["int"] | TYPE_BITS["bigint"] | TYPE_BITS["double"],
    "bigint": TYPE_BITS["bigint"] | TYPE_BITS["double"],
    "double": TYPE_BITS["double"],
    "string": TYPE_BITS["string"],
}


def type_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    null_literal: str = "NULL",
) -> DataFrame:
    """Infer the reference type of every (string-valued) column in ONE job.

    Output, one row per column:
    ``(column, inferred_type, n_values, n_null, n_empty, n_date, n_int,
    n_bigint, n_double, n_string)`` — ``inferred_type`` ∈ {date, int,
    bigint, double, string, mixed, undefined}; ``n_values`` counts
    non-null/non-empty values; the ``n_<class>`` columns are the disjoint
    per-value class counts (the reference's type map). Non-string input
    columns are cast to string first (their profile is then the profile of
    their canonical string form). Scale shape: one explode (rows × columns)
    + one hash aggregation with map-side combine onto |columns| keys; all
    regex work is JVM codegen."""
    cols = columns or df.columns
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(c).cast("string").alias("val"),
        )
        for c in cols
    ]
    e = df.select(F.explode(F.array(*structs)).alias("s")).select(
        "s.column", "s.val"
    )
    is_null = F.col("val").isNull() | (F.col("val") == null_literal)
    is_empty = F.col("val") == ""
    cls = _value_class(F.col("val"))
    mask_expr = F.when(is_null | is_empty, F.lit(_ALL))
    for name, m in _CLASS_MASK.items():
        mask_expr = mask_expr.when(cls == name, F.lit(m))
    e = e.select(
        "column",
        is_null.cast("int").alias("is_null"),
        (~is_null & is_empty).cast("int").alias("is_empty"),
        F.when(is_null | is_empty, F.lit(None)).otherwise(cls).alias("cls"),
        mask_expr.alias("mask"),
    )

    def _cnt(name):
        # udate values are dates for counting purposes (reference's
        # CreateTypeMap files them under their deduced concrete type; the
        # date bucket is the faithful roll-up for both date shapes)
        if name == "date":
            cond = (F.col("cls") == "date") | (F.col("cls") == "udate")
        else:
            cond = F.col("cls") == name
        # count-when, not sum-of-cast: a NULL cls (null/empty value) must
        # contribute 0, never poison the aggregate to NULL
        return F.count(F.when(cond, 1)).cast("long").alias(f"n_{name}")

    agg = e.groupBy("column").agg(
        F.bit_and("mask").alias("mask"),
        F.count(F.when(F.col("cls").isNotNull(), 1)).cast("long")
        .alias("n_values"),
        F.sum("is_null").cast("long").alias("n_null"),
        F.sum("is_empty").cast("long").alias("n_empty"),
        _cnt("date"),
        _cnt("int"),
        _cnt("bigint"),
        _cnt("double"),
        _cnt("string"),
    )
    inferred = (
        F.when(F.col("n_values") == 0, F.lit("undefined"))
        .when(F.col("mask").bitwiseAND(TYPE_BITS["date"]) > 0, F.lit("date"))
        .when(F.col("mask").bitwiseAND(TYPE_BITS["int"]) > 0, F.lit("int"))
        .when(
            F.col("mask").bitwiseAND(TYPE_BITS["bigint"]) > 0,
            F.lit("bigint"),
        )
        .when(
            F.col("mask").bitwiseAND(TYPE_BITS["double"]) > 0,
            F.lit("double"),
        )
        .when(
            F.col("mask").bitwiseAND(TYPE_BITS["string"]) > 0,
            F.lit("string"),
        )
        .otherwise(F.lit("mixed"))
    )
    return agg.select(
        "column",
        inferred.alias("inferred_type"),
        "n_values",
        "n_null",
        "n_empty",
        "n_date",
        "n_int",
        "n_bigint",
        "n_double",
        "n_string",
    )
