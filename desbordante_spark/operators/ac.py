"""Algebraic-constraint discovery + verification.

Reference (/root/reference/src/core/algorithms/algebraic_constraints/):
samples row pairs, applies a binary operation (+,−,×,÷) to two numeric
columns, sorts the sampled results and clusters them into disjoint ranges —
a new range starts where the gap between consecutive sampled values exceeds
``weight``-scaled average; rows whose binop value falls outside all ranges
are exceptions (ac_algorithm.h:22-36, option names config/names.h:25-43:
``bin_operation``, ``fuzziness``, ``p_fuzz``, ``weight``, ``ac_seed``).

Spark-first: the sample is tiny (driver-side range construction is exact to
the reference's approach); the exception scan is a full filter with the
ranges inlined as a literal predicate — pushed into the scan by Catalyst.
"""

from __future__ import annotations

import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ac_build_ranges", "ac_exceptions", "ac_verify"]

_OPS = {
    "+": operator.add,
    "-": operator.sub,
    "*": operator.mul,
    "/": operator.truediv,
}


def _binop_col(col_a: str, col_b: str, op: str) -> F.Column:
    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    if op == "+":
        e = a + b
    elif op == "-":
        e = a - b
    elif op == "*":
        e = a * b
    elif op == "/":
        e = F.when(b != 0, a / b)
    else:
        raise ValueError(f"unknown bin_operation {op!r}")
    return e


def ac_build_ranges(
    df: DataFrame,
    col_a: str,
    col_b: str,
    op: str = "+",
    sample_fraction: float = 0.1,
    weight: float = 0.05,
    seed: int = 42,
    max_sample: int = 100_000,
) -> list[tuple[float, float]]:
    """Sample the binop column and cluster sorted values into disjoint
    [lo, hi] ranges with the reference's exact bundling rule
    (ac_algorithm.cpp:263-299, replayed golden-for-golden by
    discovery/ac_algorithm.py): a gap wider than ``span * weight /
    (1 - weight)`` starts a new range, ``weight == 1`` collapses to one
    [min, max] range, and fewer than two sampled rows yield no ranges.

    The driver collect is BOUNDED by ``max_sample`` (the reference samples a
    bounded count, not a fraction): a fraction-only sample of a 100-TB table
    is billions of rows on the driver. Ranges depend only on the SET of
    values present (gaps between sorted values), so the sample is taken over
    DISTINCT values — duplicates add nothing, and ranking raw rows by a
    value hash would collapse a duplicate-heavy column onto its few
    smallest-md5 values, silently dropping whole value clusters from the
    ranges. Rows are fraction-sampled first (row-level, like the
    reference — a content-hash sample would again drop whole values of a
    duplicate-heavy column), then deduplicated, then capped via a
    distributed TakeOrderedAndProject on ``md5(value)`` (unbiased across
    the value space). When the distinct count fits under the cap, every
    sampled value contributes."""
    if not (0 < weight <= 1):
        raise ValueError("weight out of range (0, 1]")
    v = _binop_col(col_a, col_b, op)
    sampled = df.select(v.alias("v")).filter(F.col("v").isNotNull())
    if sample_fraction < 1.0:
        sampled = sampled.sample(fraction=sample_fraction, seed=seed)
    vals = (
        sampled.distinct()
        .orderBy(F.md5(F.col("v").cast("string")))
        .limit(int(max_sample))
        .collect()
    )
    xs = sorted(r["v"] for r in vals)
    if not xs:
        return []
    if len(xs) == 1:
        # the reference emits no ranges for a single sampled row, but a
        # single distinct VALUE seen on 2+ rows is the one-point range
        # (ac_algorithm.cpp:266-268 counts pairs, not values)
        if sampled.limit(2).count() < 2:
            return []
        return [(xs[0], xs[0])]
    if weight >= 1:
        return [(xs[0], xs[-1])]
    delta = (xs[-1] - xs[0]) * (weight / (1.0 - weight))
    ranges: list[tuple[float, float]] = []
    lo = prev = xs[0]
    for x in xs[1:]:
        if x - prev > delta:
            ranges.append((lo, prev))
            lo = x
        prev = x
    ranges.append((lo, prev))
    return ranges


def ac_exceptions(
    df: DataFrame,
    col_a: str,
    col_b: str,
    op: str,
    ranges: list[tuple[float, float]],
) -> DataFrame:
    """Rows whose binop value lies outside every allowed range (the
    reference's exception finder), with the offending value attached."""
    v = _binop_col(col_a, col_b, op)
    inside = F.lit(False)
    for lo, hi in ranges:
        inside = inside | ((v >= F.lit(lo)) & (v <= F.lit(hi)))
    return df.withColumn("binop_value", v).filter(
        F.col("binop_value").isNotNull() & ~inside
    )


def ac_verify(
    df: DataFrame,
    col_a: str,
    col_b: str,
    op: str = "+",
    sample_fraction: float = 0.1,
    weight: float = 0.05,
    seed: int = 42,
) -> dict:
    """Discover ranges on a sample, verify on the full table. Returns
    ``{ranges, num_exceptions, total_rows, exception_fraction,
    exceptions (lazy DataFrame)}``."""
    ranges = ac_build_ranges(df, col_a, col_b, op, sample_fraction, weight,
                             seed)
    exc = ac_exceptions(df, col_a, col_b, op, ranges)
    v = _binop_col(col_a, col_b, op)
    m = df.agg(
        F.sum(v.isNotNull().cast("long")).alias("n"),
    ).collect()[0]
    n = int(m["n"] or 0)
    n_exc = exc.count()
    return {
        "ranges": ranges,
        "num_exceptions": n_exc,
        "total_rows": n,
        "exception_fraction": n_exc / n if n else 0.0,
        "exceptions": exc,
    }
