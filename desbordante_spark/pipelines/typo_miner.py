"""Typo mining pipeline — approximate-but-not-exact FDs expose typo clusters.

Reference: TypoMiner runs a precise FD miner and an approximate one over the
same loaded relation; FDs that hold approximately but not exactly point at
clusters where a dominant RHS value co-exists with near-miss variants; the
candidate typos are filtered by metrizable distance ``radius`` and cluster
deviation ``ratio`` (/root/reference/src/core/algorithms/pipelines/
typo_miner/typo_miner.h:16-100).

Spark-first composition (the reference's intended pipeline style — Python-
level composition over shared data): the FD verifier's violating clusters
joined back to rows, keeping clusters whose most-frequent-RHS proportion ≥
``ratio`` (a clear majority — the "correct" value) and whose deviating values
are within ``radius`` Levenshtein distance of it (JVM ``levenshtein``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.operators.fd import fd_violations

__all__ = ["find_typo_candidates"]


def find_typo_candidates(
    df: DataFrame,
    lhs: Sequence[str],
    rhs: str,
    radius: int = 2,
    ratio: float = 0.5,
) -> DataFrame:
    """Typo candidates: ``(lhs..., majority_value, candidate_value,
    candidate_count, distance)`` — minority RHS values within ``radius``
    edits of the cluster's majority value, in clusters where the majority
    holds ≥ ``ratio`` of rows."""
    lhs = list(lhs)
    viol = fd_violations(df, lhs, [rhs]).filter(
        F.col("most_frequent_rhs_proportion") >= ratio
    )
    counts = df.groupBy(*lhs, rhs).agg(F.count(F.lit(1)).alias("cnt"))
    w_cond = [F.col(f"c.{c}").eqNullSafe(F.col(f"v.{c}")) for c in lhs]
    tagged = counts.alias("c").join(viol.alias("v"), w_cond, "inner").select(
        *[F.col(f"c.{c}").alias(c) for c in lhs],
        F.col(f"c.{rhs}").alias("value"),
        F.col("c.cnt").alias("cnt"),
        F.col("v.cluster_size").alias("cluster_size"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*lhs).orderBy(F.col("cnt").desc(), F.col("value").asc())
    ranked = tagged.withColumn("_rk", F.row_number().over(w))
    majority = ranked.filter(F.col("_rk") == 1).select(
        *lhs, F.col("value").alias("majority_value"),
        F.col("cnt").alias("majority_count"),
    )
    minority = ranked.filter(F.col("_rk") > 1).alias("mn")
    mj = majority.alias("mj")
    cond = [
        F.col(f"mn.{c}").eqNullSafe(F.col(f"mj.{c}")) for c in lhs
    ]
    joined = minority.join(mj, cond).select(
        *[F.col(f"mn.{c}").alias(c) for c in lhs],
        F.col("mj.majority_value").alias("majority_value"),
        F.col("mn.value").alias("candidate_value"),
        F.col("mn.cnt").alias("candidate_count"),
        F.levenshtein(F.col("mn.value"), F.col("mj.majority_value")).alias(
            "distance"
        ),
    )
    return joined.filter(F.col("distance") <= radius)
