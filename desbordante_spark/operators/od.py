"""Order-dependency verification (swap detection).

Reference context (/root/reference): set-based OD discovery via stripped
partitions + range tables (od/fastod/fastod.h:20-50) and list-based ODs over
sorted partitions (od/order/order.h:17-47). The *verification* question those
structures answer: within each context partition, does ordering by LHS order
RHS — i.e. is there no "swap" pair with ``lhs_a < lhs_b`` but
``rhs_a > rhs_b``?

Spark-first: group to ``(context, lhs)`` granularity with ``min/max(rhs)``,
then ONE ordered window pass per context — the running max of ``max_rhs``
over strictly-smaller LHS values must not exceed the current group's
``min_rhs``. Exact swap semantics (ties within an LHS value are free to
reorder), two shuffles total (hash agg + window sort), no pairwise joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from desbordante_spark.model import VerificationResult

__all__ = ["od_violations", "od_verify"]


def od_violations(
    df: DataFrame,
    lhs: str,
    rhs: str,
    context: Sequence[str] = (),
    descending: bool = False,
) -> DataFrame:
    """LHS groups participating in a swap:
    ``(context..., lhs, group_size, min_rhs, prev_max_rhs)`` where a smaller
    LHS value already produced a larger RHS. Rows with null lhs/rhs are
    excluded (no order position)."""
    context = list(context)
    base = df.filter(F.col(lhs).isNotNull() & F.col(rhs).isNotNull())
    rhs_v = F.col(rhs) if not descending else -F.col(rhs)
    g = base.groupBy(*context, lhs).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min(rhs_v).alias("min_rhs"),
        F.max(rhs_v).alias("max_rhs"),
    )
    w = (
        Window.partitionBy(*context)
        .orderBy(F.col(lhs).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("prev_max_rhs", F.max("max_rhs").over(w))
    return g.filter(F.col("prev_max_rhs") > F.col("min_rhs")).select(
        *context, lhs, "group_size", "min_rhs", "prev_max_rhs"
    )


def od_verify(
    df: DataFrame,
    lhs: str,
    rhs: str,
    context: Sequence[str] = (),
    descending: bool = False,
) -> VerificationResult:
    """OD verdict: holds iff no swap; error = violating-group fraction."""
    viol = od_violations(df, lhs, rhs, context, descending)
    total_groups = (
        df.filter(F.col(lhs).isNotNull() & F.col(rhs).isNotNull())
        .select(*context, lhs).distinct().count()
    )
    m = viol.agg(
        F.count(F.lit(1)).alias("nvc"),
        F.coalesce(F.sum("group_size"), F.lit(0)).alias("nvr"),
    ).collect()[0]
    nvc = int(m["nvc"])
    return VerificationResult(
        holds=nvc == 0,
        error=nvc / total_groups if total_groups else 0.0,
        num_violating_clusters=nvc,
        num_violating_rows=int(m["nvr"]),
        total_rows=total_groups,
        violations=viol,
        details={"lhs": lhs, "rhs": rhs, "context": tuple(context),
                 "descending": descending},
    )
