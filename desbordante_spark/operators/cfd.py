"""Conditional-FD verification.

Reference context (/root/reference/src/core/algorithms/cfd/): CFDs are FDs
that hold on the subset of rows matching a pattern tableau — patterns bind
columns to constants or wildcards (``_``); discovery is an itemset-lattice
DFS (fd_first_dfs, options cfd_minsup/cfd_minconf, config/names.h:46-51).

Verification maps directly: filter to the pattern's rows, then run the FD/AFD
machinery (Catalyst pushes the pattern predicate into the scan). A constant
RHS pattern additionally requires the RHS to equal the bound constant.
Support = matching-row count; confidence = 1 − g1 error (maps to cfd_minconf).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.model import as_cols, FDResult
from desbordante_spark.operators.fd import fd_metrics_df, fd_violations

__all__ = ["cfd_verify", "cfd_metrics_df", "cfd_tableau_metrics_df",
           "cfd_tableau_verify"]

WILDCARD = "_"


def _apply_pattern(df: DataFrame, pattern: Mapping[str, Any]) -> DataFrame:
    out = df
    for col, val in pattern.items():
        if val == WILDCARD:
            continue
        out = out.filter(F.col(col) == F.lit(val))
    return out


def _pattern_cond(pattern: Mapping[str, Any]) -> F.Column:
    cond = F.lit(True)
    for col, val in pattern.items():
        if val == WILDCARD:
            continue
        cond = cond & (F.col(col) == F.lit(val))
    return cond


def _pattern_label(pattern: Mapping[str, Any]) -> str:
    return " AND ".join(
        f"{c}={pattern[c]}" for c in sorted(pattern) if pattern[c] != WILDCARD
    ) or "(all)"


def cfd_tableau_metrics_df(
    df: DataFrame,
    lhs: Sequence[str],
    rhs: Sequence[str],
    tableau: Sequence[Mapping[str, Any]],
    error_threshold: float = 0.0,
    min_support: int = 0,
) -> DataFrame:
    """Per-pattern CFD verdicts for a pattern *tableau* (reference CFDs bind
    a tableau of constant/wildcard rows, /root/reference/src/core/algorithms/
    cfd/, options cfd_minsup/cfd_minconf in config/names.h:46-51).

    ONE data pass for the whole tableau: each row is tagged with every
    pattern it matches (a row-local array filter + explode — rows matching k
    patterns fan out k times, rows matching none drop before the shuffle),
    then the standard two-level FD aggregation runs keyed by ``pattern_id``.
    Patterns with zero matching rows still appear (support 0; vacuously
    holding unless ``min_support`` > 0 rejects them).

    Output: ``(pattern_id, pattern, support, num_violating_clusters,
    num_violating_rows, error, confidence, holds)`` — ``holds`` requires
    confidence ≥ 1 − error_threshold AND support ≥ min_support.
    """
    lhs = as_cols(lhs)
    rhs = as_cols(rhs)
    tableau = list(tableau)
    if not tableau:
        raise ValueError("empty tableau")
    # coarse disjunction first: a plain OR-of-equalities predicate is
    # pushable into the scan (explode/array filters are not), so rows
    # matching no pattern never leave the parquet reader
    any_pattern = F.lit(False)
    for p in tableau:
        any_pattern = any_pattern | _pattern_cond(p)
    tags = F.array(
        *[F.when(_pattern_cond(p), F.lit(i)) for i, p in enumerate(tableau)]
    )
    tagged = df.filter(any_pattern).withColumn(
        "pattern_id", F.explode(F.filter(tags, lambda x: x.isNotNull()))
    )
    m = fd_metrics_df(tagged, lhs, rhs, error_threshold, by=["pattern_id"])
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(i, _pattern_label(p)) for i, p in enumerate(tableau)],
        "pattern_id int, pattern string",
    )
    # broadcast the AGGREGATED side (tiny: one row per pattern) — a hint on
    # the preserved left side of an outer join is unsupported and silently
    # dropped, leaving a shuffle join
    j = dim.join(F.broadcast(m), "pattern_id", "left")
    support = F.coalesce(F.col("total_rows"), F.lit(0)).cast("long")
    error = F.coalesce(F.col("error"), F.lit(0.0))
    holds = (
        (error <= F.lit(error_threshold))
        & (support >= F.lit(int(min_support)))
    )
    return j.select(
        "pattern_id",
        "pattern",
        support.alias("support"),
        F.coalesce(F.col("num_violating_clusters"), F.lit(0)).cast("long")
        .alias("num_violating_clusters"),
        F.coalesce(F.col("num_violating_rows"), F.lit(0)).cast("long")
        .alias("num_violating_rows"),
        error.alias("error"),
        (1.0 - error).alias("confidence"),
        holds.cast("int").alias("holds"),
    )


def cfd_tableau_verify(
    df: DataFrame,
    lhs: Sequence[str],
    rhs: Sequence[str],
    tableau: Sequence[Mapping[str, Any]],
    error_threshold: float = 0.0,
    min_support: int = 0,
) -> FDResult:
    """Combined tableau verdict: the CFD holds iff EVERY pattern row holds
    (per-pattern support/confidence in ``details["patterns"]``)."""
    lhs = as_cols(lhs)
    rhs = as_cols(rhs)
    rows = cfd_tableau_metrics_df(
        df, lhs, rhs, tableau, error_threshold, min_support
    ).collect()
    total = sum(int(r["support"]) for r in rows)
    nvr = sum(int(r["num_violating_rows"]) for r in rows)
    nvc = sum(int(r["num_violating_clusters"]) for r in rows)
    worst = max((float(r["error"]) for r in rows), default=0.0)
    return FDResult(
        holds=all(bool(r["holds"]) for r in rows),
        error=worst,
        num_violating_clusters=nvc,
        num_violating_rows=nvr,
        total_rows=total,
        violations=None,
        lhs=tuple(lhs),
        rhs=tuple(rhs),
        details={"patterns": [r.asDict() for r in rows],
                 "error_threshold": error_threshold,
                 "min_support": min_support},
    )


def cfd_metrics_df(
    df: DataFrame,
    lhs: Sequence[str],
    rhs: Sequence[str],
    pattern: Mapping[str, Any] | None = None,
    rhs_constant: Any = None,
    error_threshold: float = 0.0,
) -> DataFrame:
    """One-row verdict DataFrame for the CFD: FD metrics on the
    pattern-filtered subset, plus ``support``/``confidence`` columns."""
    lhs = as_cols(lhs)
    rhs = as_cols(rhs)
    sub = _apply_pattern(df, pattern or {})
    if rhs_constant is not None:
        if len(rhs) != 1:
            raise ValueError("rhs_constant requires a single RHS column")
        # constant CFD: every matching row must carry the constant — model as
        # FD onto the boolean mismatch flag being constant-false; simpler:
        # metrics computed directly
        n = F.count(F.lit(1))
        bad = F.sum((~F.col(rhs[0]).eqNullSafe(F.lit(rhs_constant))).cast("long"))
        agg = sub.agg(
            n.cast("long").alias("support"),
            F.coalesce(bad, F.lit(0)).cast("long").alias("num_violating_rows"),
        )
        return agg.select(
            "support",
            "num_violating_rows",
            F.when(
                F.col("support") > 0,
                1.0 - F.col("num_violating_rows").cast("double")
                / F.col("support").cast("double"),
            ).otherwise(F.lit(1.0)).alias("confidence"),
            (F.col("num_violating_rows") == 0).cast("int").alias("holds"),
        )
    m = fd_metrics_df(sub, lhs, rhs, error_threshold)
    return m.select(
        F.col("total_rows").alias("support"),
        "num_violating_clusters",
        "num_violating_rows",
        "error",
        (1.0 - F.col("error")).alias("confidence"),
        "holds",
    )


def cfd_verify(
    df: DataFrame,
    lhs: Sequence[str],
    rhs: Sequence[str],
    pattern: Mapping[str, Any] | None = None,
    rhs_constant: Any = None,
    error_threshold: float = 0.0,
) -> FDResult:
    """CFD verdict: FD result over the pattern subset (variable CFD) or
    constant-agreement result (constant CFD)."""
    lhs = as_cols(lhs)
    rhs = as_cols(rhs)
    row = cfd_metrics_df(
        df, lhs, rhs, pattern, rhs_constant, error_threshold
    ).collect()[0]
    sub = _apply_pattern(df, pattern or {})
    if rhs_constant is not None:
        viol = sub.filter(~F.col(rhs[0]).eqNullSafe(F.lit(rhs_constant)))
        return FDResult(
            holds=bool(row["holds"]),
            error=1.0 - float(row["confidence"]),
            num_violating_clusters=int(row["num_violating_rows"] > 0),
            num_violating_rows=int(row["num_violating_rows"]),
            total_rows=int(row["support"]),
            violations=viol,
            lhs=tuple(lhs),
            rhs=tuple(rhs),
            details={"pattern": dict(pattern or {}), "rhs_constant": rhs_constant},
        )
    return FDResult(
        holds=bool(row["holds"]),
        error=float(row["error"]),
        num_violating_clusters=int(row["num_violating_clusters"]),
        num_violating_rows=int(row["num_violating_rows"]),
        total_rows=int(row["support"]),
        violations=fd_violations(sub, lhs, rhs),
        lhs=tuple(lhs),
        rhs=tuple(rhs),
        details={"pattern": dict(pattern or {}),
                 "error_threshold": error_threshold},
    )
