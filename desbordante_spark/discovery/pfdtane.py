"""AFD discovery — PFDTane-style levelwise search with per_tuple/per_value
error measures.

Reference: PFDTane mines probabilistic FDs levelwise, scoring each candidate
X → A with an error measure over the X-partition
(/root/reference/src/core/algorithms/fd/pfdtane/, enums.h:6 — per_tuple =
changed-row fraction, per_value = average per-cluster violation mass) and
keeping minimal candidates under the threshold. ``error_measure="g1"``
scores with the classic pair-based g1 instead (stats_calculator.cpp:83) —
the measure of the reference's AFD miners (fd/tane with error, fd/pyro),
so Tane/Pyro-style AFD mining is this module with g1.

Spark-first: ALL candidates of a level are scored in ONE job. Each row
explodes to ``(candidate_id, lhs_key, rhs_value)`` tuples (row-local array —
the levelwise Expand price, same as TANE), then a single three-level
aggregation — (cid, key, value) counts → per-cluster size + max-value count
→ per-candidate error — scores every candidate simultaneously. Minimality
(a qualifying subset prunes supersets for the same RHS) and the trivial
∅ → A level are handled by the driver's candidate bookkeeping, which never
touches data.

Pruning note: the only prune here is MINIMALITY (a qualifying subset
removes its supersets for the same RHS) — definitional and sound for any
measure. ``g1`` and ``per_tuple`` are additionally monotone non-increasing
in the LHS (finer partitions keep at least as many kept rows); ``per_value``
is NOT anti-monotone (splitting a cluster can raise the equal-weight
per-cluster average, e.g. {x:9,y:1} → {x:1,y:1}+{x:8} lifts the error from
0.1 to 0.25), which is why the Pyro traversal (pyro.py) — whose non-dep
coverage prune relies on anti-monotonicity — delegates per_value to this
levelwise enumeration.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.discovery.common import encode_value, group_key

__all__ = ["discover_afds"]


#: above this candidate count a level is scored in bounded batches —
#: one job's explode factor stays ≤ _SCORE_CHUNK structs per row (wide
#: level-3+ lattices on tall frames would otherwise plan one job with a
#: billions-of-rows pre-aggregation; same policy as fastod's pair-mass
#: budget). Most levels are far below the threshold and keep one job.
_SCORE_CHUNK = 400


def _score_level(
    df: DataFrame,
    cands: list[tuple[tuple[str, ...], str]],
    error_measure: str,
) -> dict[int, float]:
    """Per candidate (lhs_set, rhs) → error; one job per ≤_SCORE_CHUNK
    candidates."""
    if len(cands) > _SCORE_CHUNK:
        out: dict[int, float] = {}
        for lo in range(0, len(cands), _SCORE_CHUNK):
            part = _score_level(df, cands[lo:lo + _SCORE_CHUNK],
                                error_measure)
            for i, v in part.items():
                out[lo + i] = v
        return out
    structs = []
    for i, (lhs, rhs) in enumerate(cands):
        # injective keys (common.group_key/encode_value): length-prefixed
        # values — no cross-column or value-equals-sentinel collisions
        structs.append(
            F.struct(
                F.lit(i).alias("cid"),
                group_key(lhs).alias("xk"),
                encode_value(rhs).alias("av"),
            )
        )
    exploded = df.select(F.explode(F.array(*structs)).alias("c")).select(
        "c.cid", "c.xk", "c.av"
    )
    lvl1 = exploded.groupBy("cid", "xk", "av").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    lvl2 = lvl1.groupBy("cid", "xk").agg(
        F.sum("cnt").alias("sz"),
        F.max("cnt").alias("keep"),
        F.sum(F.col("cnt") * (F.col("cnt") - 1)).alias("rhs_pairs"),
    )
    agg = lvl2.groupBy("cid").agg(
        F.sum("sz").alias("n"),
        F.sum("keep").alias("keep"),
        F.count(F.lit(1)).alias("nclusters"),
        F.sum(F.col("keep").cast("double") / F.col("sz").cast("double"))
        .alias("keep_frac"),
        F.sum(F.col("sz") * (F.col("sz") - 1)).alias("lhs_pairs"),
        F.sum("rhs_pairs").alias("rhs_pairs"),
    )
    if error_measure == "g1":
        # pair-based g1 (stats_calculator.cpp:83): conflicting ordered
        # pairs / (n^2 - n) — the measure the reference's AFD miners
        # (Tane/Pyro) and verifier share; exact integer pair counts
        err = F.when(
            F.col("n") > 1,
            (F.col("lhs_pairs") - F.col("rhs_pairs")).cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1).cast("double")),
        ).otherwise(F.lit(0.0))
    elif error_measure == "per_tuple":
        err = F.when(
            F.col("n") > 0,
            1.0 - F.col("keep").cast("double") / F.col("n").cast("double"),
        ).otherwise(F.lit(0.0))
    else:
        err = F.when(
            F.col("nclusters") > 0,
            1.0 - F.col("keep_frac") / F.col("nclusters").cast("double"),
        ).otherwise(F.lit(0.0))
    rows = agg.select("cid", err.alias("err")).collect()
    got = {int(r["cid"]): float(r["err"]) for r in rows}
    # empty input yields no aggregation rows — error 0 (vacuously holds)
    return {i: got.get(i, 0.0) for i in range(len(cands))}


def discover_afds(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
    max_error: float = 0.05,
    error_measure: str = "per_tuple",
    sample_fraction: float | None = None,
    sample_margin: float = 0.05,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str, float]]:
    """All minimal AFDs ``X -> A`` with error ≤ ``max_error`` and
    ``|X| <= max_lhs``. Returns sorted ``[(lhs_tuple, rhs, error), ...]``;
    near-constant columns yield ``() -> A`` (the trivial one-cluster case).

    ``sample_fraction`` enables Pyro-style two-phase scoring (reference
    fd/pyro/pyro.h:13-31 — sample-based error estimation before exact
    checks): each level's candidates are first scored on a row sample (same
    batched job, far less data) and only candidates whose ESTIMATED error is
    ≤ ``max_error + sample_margin`` get the exact pass. Every reported AFD
    carries an exact error; the (documented) probabilistic risk is pruning a
    true AFD whose sample estimate exceeded the margin. For the traversal
    that SKIPS lattice regions instead of enumerating every level, see
    ``pyro.discover_afds_pyro`` (identical output, estimate-steered).

    Pass ``stats={}`` to receive ``{"exact_scored", "estimate_scored"}``
    (candidate evaluation counts — the levelwise baseline for the Pyro
    traversal's node-visit evidence).
    """
    if error_measure not in ("per_tuple", "per_value", "g1"):
        raise ValueError(f"unknown error_measure {error_measure!r}")
    cols = sorted(columns or df.columns)
    afds: list[tuple[tuple[str, ...], str, float]] = []
    found: dict[str, list[tuple[str, ...]]] = {c: [] for c in cols}
    from desbordante_spark.discovery.common import content_sample

    sample = (
        content_sample(df, sample_fraction)
        if sample_fraction is not None and sample_fraction < 1.0
        else None
    )
    counters = {"exact_scored": 0, "estimate_scored": 0}

    def score(cands: list[tuple[tuple[str, ...], str]]) -> dict[int, float]:
        """Exact scores for all candidates; with a sample, estimate first
        and exact-score only the plausible ones (others get inf)."""
        if sample is None:
            counters["exact_scored"] += len(cands)
            return _score_level(df, cands, error_measure)
        counters["estimate_scored"] += len(cands)
        est = _score_level(sample, cands, error_measure)
        todo = [i for i in range(len(cands))
                if est.get(i, 0.0) <= max_error + sample_margin]
        counters["exact_scored"] += len(todo)
        exact = (
            _score_level(df, [cands[i] for i in todo], error_measure)
            if todo else {}
        )
        out = {i: float("inf") for i in range(len(cands))}
        for j, i in enumerate(todo):
            out[i] = exact[j]
        return out

    # level 0: ∅ -> A (single cluster; error = non-modal fraction)
    lvl0 = [((), a) for a in cols]
    scores = score(lvl0)
    for i, ((_, a)) in enumerate(lvl0):
        if scores[i] <= max_error:
            afds.append(((), a, scores[i]))
            found[a].append(())

    level_sets: list[tuple[str, ...]] = [(c,) for c in cols]
    for level in range(1, max_lhs + 1):
        cands = []
        for s in level_sets:
            if len(s) != level:
                continue
            for a in cols:
                if a in s:
                    continue
                if any(set(prev) <= set(s) for prev in found[a]):
                    continue  # minimality: a subset already qualifies
                cands.append((s, a))
        if not cands:
            break
        scores = score(cands)
        for i, (s, a) in enumerate(cands):
            if scores[i] <= max_error:
                afds.append((s, a, scores[i]))
                found[a].append(s)
        nxt = set()
        for s in level_sets:
            for c in cols:
                if c > s[-1]:
                    nxt.add(tuple(sorted({*s, c})))
        level_sets = sorted(nxt)
    if stats is not None:
        stats.update(counters)
    return sorted(afds)
