"""Shared primitives for the discovery miners.

- ``pair_mass_level`` — the batched equal-pair counting job used by the
  AUCC miner and the FDep agree-set factory: every candidate column set of
  a lattice level is scored in ONE exploded two-level aggregation
  (map-side combine bounds the shuffle at distinct keys per candidate).
  Sums are exact BIGINTs; under ANSI mode a sum past int64 (a single
  ≳3·10⁹-row duplicate cluster) fails loudly rather than wrapping.
- ``content_sample`` — a partition-layout-INDEPENDENT row sample for the
  Pyro-style estimate→confirm paths. ``DataFrame.sample(seed=)`` is only
  deterministic for a fixed partitioning, so a miner gated against an
  exact oracle would flake across session configs (split counts change
  with maxPartitionBytes/core count). Hashing row CONTENT instead makes
  the sampled set a pure function of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SEP", "NULL", "encode_value", "group_key", "pair_mass_level",
           "distinct_count_level", "content_sample"]

SEP = "\x01"
NULL = "\x00∅"


def encode_value(c: str | Column) -> Column:
    """Collision-free single-value encoding for composite grouping keys:
    non-null values are LENGTH-PREFIXED (``len:value``), nulls become the
    unprefixed ``NULL`` marker. The framing makes the joined key
    injective — a value containing the separator byte, or a value equal
    to the null marker itself, can no longer collide across column
    boundaries (every non-null token starts with digits + ':', the null
    marker starts with a non-digit, and the length pins each token's
    span). Plain ``concat_ws(SEP, coalesce(...))`` keys lacked both
    guarantees."""
    s = F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
    return F.when(s.isNull(), F.lit(NULL)).otherwise(
        F.concat(F.length(s).cast("string"), F.lit(":"), s)
    )


def group_key(cols: tuple[str, ...] | list[str]) -> Column:
    """Injective multi-column grouping key (see ``encode_value``); the
    empty column set yields the empty string (one global group)."""
    if not cols:
        return F.lit("")
    return F.concat_ws(SEP, *[encode_value(c) for c in cols])


def pair_mass_level(
    df: DataFrame, cands: list[tuple[str, ...]]
) -> dict[int, tuple[int, int]]:
    """ONE job: per candidate column set → ``(equal_pairs_2x, n_rows)``
    where ``equal_pairs_2x = Σ c·(c−1)`` over the candidate's key clusters
    (null-safe keys: nulls agree). Candidates missing from the aggregation
    (empty input) come back as ``(0, 0)``."""
    structs = []
    for i, cols in enumerate(cands):
        structs.append(
            F.struct(F.lit(i).alias("cid"), group_key(cols).alias("k"))
        )
    e = df.select(F.explode(F.array(*structs)).alias("c")).select(
        "c.cid", "c.k"
    )
    g = e.groupBy("cid", "k").agg(F.count(F.lit(1)).alias("cnt"))
    rows = (
        g.groupBy("cid")
        .agg(
            F.sum(F.col("cnt") * (F.col("cnt") - 1)).cast("long").alias("ep"),
            F.sum("cnt").cast("long").alias("n"),
        )
        .collect()
    )
    got = {int(r["cid"]): (int(r["ep"]), int(r["n"])) for r in rows}
    return {i: got.get(i, (0, 0)) for i in range(len(cands))}


def distinct_count_level(
    df: DataFrame, cands: list[tuple[str, ...]]
) -> dict[int, int]:
    """ONE job: per candidate column set → EXACT distinct key count
    (null-safe keys: nulls agree), via the same explode + two-level
    aggregation as ``pair_mass_level``. Unlike batching many
    ``count_distinct`` aggregates into one ``agg`` (tane.distinct_counts),
    this never plans an Expand — Catalyst rewrites N distinct aggregates
    into an N× row replication, measured 15× slower at 11 candidates on
    this host — so it is the shape that survives wide lattice levels.
    Candidates missing from the aggregation (empty input) come back as 0."""
    if not cands:
        return {}
    structs = []
    for i, cols in enumerate(cands):
        structs.append(
            F.struct(F.lit(i).alias("cid"), group_key(cols).alias("k"))
        )
    e = df.select(F.explode(F.array(*structs)).alias("c")).select(
        "c.cid", "c.k"
    )
    g = e.groupBy("cid", "k").agg(F.count(F.lit(1)).alias("cnt"))
    rows = (
        g.groupBy("cid")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .collect()
    )
    got = {int(r["cid"]): int(r["d"]) for r in rows}
    return {i: got.get(i, 0) for i in range(len(cands))}


def content_sample(
    df: DataFrame, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic ~``fraction`` row sample keyed on row CONTENT
    (xxhash64 of all columns), independent of partition layout. Duplicate
    rows are kept or dropped together — fine for error estimation, where
    the estimate feeds an exact confirmation pass anyway."""
    h = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]), F.lit(seed))
    bound = int(fraction * 1_000_000)
    return df.filter(F.pmod(h, F.lit(1_000_000)) < bound)
