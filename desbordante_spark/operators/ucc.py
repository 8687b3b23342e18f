"""UCC / AUCC verification (unique column combinations).

Reference semantics (/root/reference):
- A UCC over columns X holds iff the PLI over X has no cluster of size > 1
  (src/core/algorithms/ucc/ucc_verifier/ucc_verifier.cpp:64-69).
- AUCC error = ``sum_over_clusters c*(c-1) / (n*(n-1))``
  (ucc_verifier/ucc_stats_calculator.h:31-45) — unordered violating pairs over
  all row pairs, i.e. the probability two random distinct rows agree on X.
- Evidence = the violating clusters as row-index lists, sorted by first row id
  (src/core/model/table/position_list_index.cpp:114-117).
- ``is_null_equal_null`` (src/core/config/names.h:12): true → all-null keys
  form one cluster (Spark groupBy's native behavior); false → rows with a null
  in X are dropped from clusters before verification
  (position_list_index.cpp:53-59).

Spark-first design (NOT a PLI port): the PLI questions are answered by a
single hash aggregation ``groupBy(X).count()`` — Catalyst performs map-side
partial aggregation, so even a 10^12-row scan sends at most one partial row
per (partition, key) into the shuffle; a hot duplicate key therefore cannot
skew the exchange. All verdict metrics come from ONE two-level aggregation
job (no driver-side iteration). Evidence row-id lists are a separate lazy
plan, capped per cluster via a window `row_number` so a pathological
billion-row cluster never materializes on one task beyond the cap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from desbordante_spark.model import as_cols, UCCResult
from desbordante_spark.sources.readers import spread_small_input_by

__all__ = ["ucc_violations", "ucc_verify", "ucc_violating_clusters", "ucc_metrics_df"]


def _base(df: DataFrame, columns: Sequence[str], is_null_equal_null: bool) -> DataFrame:
    if is_null_equal_null:
        return df
    # null != null: a row with any null in X can never collide -> drop it
    # (position_list_index.cpp:53-59 strips null rows from clusters).
    # isNotNull filters push down to the scan; na.drop's AtLeastNNulls not.
    out = df
    for c in columns:
        out = out.filter(F.col(c).isNotNull())
    return out


def ucc_violations(
    df: DataFrame,
    columns: Sequence[str],
    is_null_equal_null: bool = True,
) -> DataFrame:
    """Violating key groups: one row per duplicate key, ``(X..., cnt)``.

    This is the scale path for e.g. the 10^12-row ``doc_id`` uniqueness check:
    partial-agg + AQE-coalesced exchange; output is only the duplicate keys.
    """
    columns = as_cols(columns)
    base = _base(df, columns, is_null_equal_null)
    # by-key spread (see spread_small_input_by): a uniqueness check's keys
    # are mostly distinct, so map-side partial aggregation cannot compress
    # them — on an under-parallel input (single-file scan) the one shuffle
    # might as well establish the final partitioning and run the whole
    # aggregation in parallel
    base = spread_small_input_by(base.select(*columns), columns)
    return (
        base.groupBy(*columns)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def ucc_metrics_df(
    df: DataFrame,
    columns: Sequence[str],
    is_null_equal_null: bool = True,
    error_threshold: float = 0.0,
    by: Sequence[str] = (),
    salt: int = 0,
) -> DataFrame:
    """Verdict DataFrame (no action):
    ``(by..., total_rows, num_violating_clusters, num_violating_rows, error,
    holds)`` — one row per ``by`` group (north-rule per-partition verdicts),
    or a single global row when ``by`` is empty. ``holds`` is int (1/0) for
    cross-engine comparability. ``salt > 1`` forces an explicit salted
    two-phase aggregation (see inline note)."""
    columns = as_cols(columns)
    by = as_cols(by) if by else []
    by = list(by)
    base = _base(df, columns, is_null_equal_null)
    if salt and salt > 1:
        # explicit salted two-phase aggregation (north-rule technique for
        # hot keys): phase 1 counts per (salt-bucket, key) — a key hammered
        # by one partition's worth of duplicates is split across `salt`
        # reducers — phase 2 merges buckets per key. With Catalyst's
        # map-side partial aggregation this is usually redundant (partials
        # already bound per-key shuffle rows by #partitions); it matters
        # when partial agg is disabled or the key count per task overflows
        # the hash-agg fallback to sort-based aggregation.
        bucket = F.pmod(
            F.xxhash64(*[F.col(c) for c in columns]), F.lit(salt)
        ).alias("_salt")
        partial = base.groupBy(bucket, *by, *columns).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        counts = partial.groupBy(*by, *columns).agg(
            F.sum("cnt").alias("cnt")
        )
    else:
        # by-key spread: uniqueness keys don't compress under partial agg,
        # so on an under-parallel input one keyed shuffle both parallelizes
        # and satisfies this groupBy AND the per-``by`` rollup below
        keys = by + list(columns)
        counts = spread_small_input_by(base.select(*keys), keys).groupBy(
            *by, *columns
        ).agg(F.count(F.lit(1)).alias("cnt"))
    viol = F.col("cnt") > 1
    agg = counts.groupBy(*by).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("total_rows"),
        F.coalesce(F.sum(F.when(viol, 1).otherwise(0)), F.lit(0))
        .cast("long").alias("num_violating_clusters"),
        F.coalesce(F.sum(F.when(viol, F.col("cnt")).otherwise(0)), F.lit(0))
        .cast("long").alias("num_violating_rows"),
        F.coalesce(F.sum(F.col("cnt") * (F.col("cnt") - 1)), F.lit(0))
        .cast("long").alias("pairs2x"),
    )
    n = F.col("total_rows")
    err = F.when(
        n > 1, F.col("pairs2x").cast("double") / (n * (n - 1)).cast("double")
    ).otherwise(F.lit(0.0))
    holds = (
        (F.col("error") <= F.lit(error_threshold))
        if error_threshold > 0
        else (F.col("num_violating_clusters") == 0)
    )
    return (
        agg.withColumn("error", err)
        .withColumn("holds", holds.cast("int"))
        .select(*by, "total_rows", "num_violating_clusters",
                "num_violating_rows", "error", "holds")
    )


def ucc_verify(
    df: DataFrame,
    columns: Sequence[str],
    is_null_equal_null: bool = True,
    error_threshold: float = 0.0,
    row_id: str | None = None,
    evidence_cap: int = 100,
) -> UCCResult:
    """Full UCC/AUCC verdict in one aggregation job.

    Mirrors UCCVerifier getters (bind_ucc_verification.cpp:20-24): holds,
    #violating clusters, #violating rows, AUCC error; plus the violating
    clusters as a lazy DataFrame (row-id lists if ``row_id`` given).
    ``error_threshold > 0`` turns this into AUCC verification: holds iff
    ``error <= threshold``.
    """
    columns = as_cols(columns)
    m = ucc_metrics_df(df, columns, is_null_equal_null, error_threshold).collect()[0]
    n = int(m["total_rows"])
    error = float(m["error"])
    holds = bool(m["holds"])

    if row_id is not None:
        evidence = ucc_violating_clusters(
            df, columns, row_id, is_null_equal_null, evidence_cap
        )
    else:
        evidence = ucc_violations(df, columns, is_null_equal_null)

    return UCCResult(
        holds=holds,
        error=error,
        num_violating_clusters=int(m["num_violating_clusters"]),
        num_violating_rows=int(m["num_violating_rows"]),
        total_rows=n,
        violations=evidence,
        columns=tuple(columns),
        details={"error_threshold": error_threshold,
                 "is_null_equal_null": is_null_equal_null},
    )


def ucc_violating_clusters(
    df: DataFrame,
    columns: Sequence[str],
    row_id: str,
    is_null_equal_null: bool = True,
    evidence_cap: int = 100,
) -> DataFrame:
    """Violating clusters as capped, sorted row-id lists.

    Output: ``(X..., cluster_size, row_ids array<row_id>, truncated bool)``.
    ``cluster_size`` is exact; ``row_ids`` holds the first ``evidence_cap``
    ids ordered ascending (deterministic, matching the reference's
    sort-cluster-by-first-row-id, position_list_index.cpp:114-117).

    Scale note: only rows belonging to violating keys reach the window — for
    a mostly-unique key that is a tiny fraction of the input. The per-key cap
    bounds what the downstream ``collect_list`` aggregates.
    """
    columns = as_cols(columns)
    cols = list(columns)
    dup = ucc_violations(df, cols, is_null_equal_null).alias("d")  # (X..., cnt)
    rows = _base(df, cols, is_null_equal_null).select(*cols, row_id).alias("r")
    # null-safe equi-join so null keys (one cluster under is_null_equal_null)
    # still match their evidence rows
    cond = [F.col(f"r.{c}").eqNullSafe(F.col(f"d.{c}")) for c in cols]
    tagged = rows.join(dup, cond, "inner").select(
        *[F.col(f"r.{c}") for c in cols], F.col(f"r.{row_id}"), F.col("d.cnt")
    )
    w = Window.partitionBy(*cols).orderBy(F.col(row_id).asc())
    capped = tagged.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= evidence_cap
    )
    return (
        capped.groupBy(*cols)
        .agg(
            F.max("cnt").alias("cluster_size"),
            F.max("_rn").alias("_seen"),
            F.sort_array(F.collect_list(row_id)).alias("row_ids"),
        )
        .select(
            *cols,
            "cluster_size",
            "row_ids",
            (F.col("cluster_size") > F.col("_seen")).alias("truncated"),
        )
    )
