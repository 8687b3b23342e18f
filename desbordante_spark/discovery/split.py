"""DD discovery — Split-style mining of RHS difference bounds.

Reference: Split discovers differential dependencies by examining pairwise
tuple distances against candidate difference functions
(/root/reference/src/core/algorithms/dd/split/split.h:23-70; exercised by
examples/mining_dd.py). A DD ``φ[LHS] → φ[RHS]`` constrains the RHS
distance interval of every row pair whose LHS distances satisfy the LHS
difference functions.

This miner takes the LHS difference functions (the same
``{col: (lo, hi)}`` bounds the verifier consumes) and MINES the RHS side:
for every candidate RHS column it computes, over all qualifying pairs, the
tightest single interval ``[lo, hi]`` that covers every pair — the
difference function under which the DD holds exactly. All candidate RHS
columns are scored in ONE pass over the banded pairwise frame
(operators/dd.py builds it: the self-join is an equi-join on distance bands,
never a nested loop; one aggregate yields min/max/count for every column
simultaneously).

``dd_build_rhs_ranges`` additionally clusters the observed RHS distances of
a BOUNDED pair sample into gap-separated sub-intervals (the ac.py
weight-bundling semantics) for DDs that hold on disjoint distance bands.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.operators.dd import _dist, _qualifying_pairs

__all__ = ["discover_dds", "dd_build_rhs_ranges"]


def discover_dds(
    df: DataFrame,
    lhs_bounds: Mapping[str, tuple[float, float]],
    rhs_cols: Sequence[str],
    row_id: str,
    min_pairs: int = 1,
) -> DataFrame:
    """Mine, for each candidate RHS column, the tightest difference bound
    covering every qualifying pair.

    Output (one row per RHS candidate): ``(rhs_col, lo, hi, num_pairs,
    holds)`` — ``lo``/``hi`` are the exact min/max RHS distance over pairs
    satisfying every LHS bound; by construction the DD
    ``lhs_bounds → rhs_col ∈ [lo, hi]`` holds with zero exceptions.
    ``holds`` = 1 iff at least ``min_pairs`` qualifying pairs support the
    bound (a Split-style support threshold: a bound witnessed by too few
    pairs is not reported as held). Columns with no qualifying pair yield
    NULL bounds and ``holds`` = 0. ONE banded-join pass for all candidates.
    """
    rhs_cols = list(rhs_cols)
    if not rhs_cols:
        raise ValueError("no RHS candidate columns")
    pairs, dtypes = _qualifying_pairs(df, lhs_bounds, row_id,
                                      tuple(rhs_cols))
    aggs = [F.count(F.lit(1)).cast("long").alias("num_pairs")]
    for c in rhs_cols:
        d = _dist(F.col(f"a.{c}"), F.col(f"b.{c}"), dtypes[c])
        aggs.append(F.min(d).alias(f"lo_{c}"))
        aggs.append(F.max(d).alias(f"hi_{c}"))
    m = pairs.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("rhs_col"),
                F.col(f"lo_{c}").alias("lo"),
                F.col(f"hi_{c}").alias("hi"),
            )
            for c in rhs_cols
        ]
    )
    out = m.select(F.col("num_pairs"), F.explode(rows).alias("r"))
    holds = (
        (F.col("num_pairs") >= F.lit(int(min_pairs)))
        & F.col("r.lo").isNotNull()
    )
    return out.select(
        F.col("r.rhs_col").alias("rhs_col"),
        F.col("r.lo").alias("lo"),
        F.col("r.hi").alias("hi"),
        "num_pairs",
        holds.cast("int").alias("holds"),
    )


def dd_build_rhs_ranges(
    df: DataFrame,
    lhs_bounds: Mapping[str, tuple[float, float]],
    rhs_col: str,
    row_id: str,
    weight: float = 0.05,
    max_sample: int = 100_000,
) -> list[tuple[float, float]]:
    """Cluster the RHS distances of qualifying pairs into gap-separated
    intervals (ac.py's weight-bundling): a gap wider than ``weight ×
    (global span)`` starts a new interval. Intervals depend only on the SET
    of distances present, so the bounded driver collect samples DISTINCT
    distance values ranked by ``md5(value)`` (a distributed
    TakeOrderedAndProject) — ranking raw pairs would collapse an
    integer-valued distance column onto its few smallest-md5 values and
    drop whole clusters from the intervals."""
    pairs, dtypes = _qualifying_pairs(df, lhs_bounds, row_id, (rhs_col,))
    d = _dist(F.col(f"a.{rhs_col}"), F.col(f"b.{rhs_col}"), dtypes[rhs_col])
    vals = (
        pairs.select(d.alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .orderBy(F.md5(F.col("v").cast("string")))
        .limit(int(max_sample))
        .collect()
    )
    xs = sorted(r["v"] for r in vals)
    if not xs:
        return []
    span = xs[-1] - xs[0] or 1.0
    gap = weight * span
    ranges: list[tuple[float, float]] = []
    lo = prev = xs[0]
    for x in xs[1:]:
        if x - prev > gap:
            ranges.append((lo, prev))
            lo = x
        prev = x
    ranges.append((lo, prev))
    return ranges
