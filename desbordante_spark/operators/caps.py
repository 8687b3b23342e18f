"""Bucket-cap accounting shared by the LSH/blocking operators.

Policy (SURVEY.md §4): degenerate mass buckets (e.g. empty docs all hashing
together) are capped so no blocking join can go quadratic — but never
*silently*: ``report_dropped`` runs one tiny aggregate over the (already
computed) bucket-size frame and surfaces how many buckets / member ids were
excluded, so a corpus-scale run can tell "no near-dups" apart from "the
duplicate-dense mass was capped away".
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["report_dropped"]

_log = logging.getLogger("desbordante_spark.caps")


def report_dropped(
    sizes: DataFrame,
    size_col: str,
    max_bucket: int,
    dropped_report: dict | None,
    operator: str,
) -> None:
    """Fill ``dropped_report`` (when given) with the over-cap bucket counts
    and log a warning if anything was dropped. No-op when the caller didn't
    ask (``dropped_report is None``) — the extra job only runs on request."""
    if dropped_report is None:
        return
    row = (
        sizes.filter(F.col(size_col) > max_bucket)
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.coalesce(F.sum(size_col), F.lit(0)).alias("ni"),
        )
        .collect()[0]
    )
    dropped_report["n_buckets_dropped"] = int(row["nb"])
    dropped_report["n_ids_in_dropped"] = int(row["ni"])
    if row["nb"]:
        _log.warning(
            "%s: dropped %d over-cap bucket(s) holding %d ids "
            "(max_bucket=%d) — near-dup recall inside those buckets is 0",
            operator, int(row["nb"]), int(row["ni"]), max_bucket,
        )
