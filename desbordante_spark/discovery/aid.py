"""AID-FD-style approximate FD discovery — sample-until-convergence
negative cover, NO validation phase.

Reference: AID-FD ("approximate it and don't validate") grows a sampled
negative cover in rounds and stops when new rounds stop changing the
induced FD set, then inverts the cover into the positive cover WITHOUT
ever validating a candidate against the full data
(/root/reference/src/core/algorithms/fd/aidfd/aid.cpp: ``BuildClusters``
index-samples rows, ``HandleTuple`` grows the negative cover,
``IsAppropriateWindow``/``kGrowthRate`` implement the convergence window;
the positive cover inversion lives in ``search_tree.cpp``). The output
contract is explicitly approximate: refutations are sound (every sampled
pair is a real pair), so reported FDs can only err by being TOO GENERAL —
for every true minimal FD ``X -> a`` the result contains ``Y -> a`` with
``Y ⊆ X``; it never misses a dependency direction entirely.

Spark-first: one round = ONE batched job — the HyFD sampler
(hyfd.sample_agree_sets) with neighbor ``offset`` d pairs every row with
its d-th neighbor inside each (column, value) cluster. Successive rounds
use offsets 1, 2, 3, … — disjoint, progressively wider pair samples, the
analog of AID's growing sample windows. Rounds stop when one adds NO new
agree set (the convergence window) or ``max_rounds`` is hit. Clusters are
ordered by a hash of row content, so the sampled pair set — and therefore
the OUTPUT — is a pure function of the data, independent of partition
layout (AID's index-order sampling is only deterministic single-node).

The inductor is the same driver-side minimal-candidate bookkeeping as
discovery/hyfd.py; the validator is deliberately absent. Use
``hyfd.discover_fds_hybrid`` when exact results are required — AID is the
"perfect recall, bounded rounds" point of the reference's speed/soundness
trade, at ~1 job per round regardless of table width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from desbordante_spark.discovery.hyfd import (
    _insert_minimal,
    _specialize,
    sample_agree_sets,
)
from desbordante_spark.discovery.tane import distinct_counts

__all__ = ["discover_fds_aid"]


def discover_fds_aid(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
    max_rounds: int = 4,
    max_agree_sets: int = 10_000,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """Approximate minimal FDs ``X -> a`` with ``|X| <= max_lhs`` from the
    converged sampled negative cover — no validation jobs.

    Guarantee (refutation soundness): the result contains, for every true
    minimal FD ``X -> a`` within ``max_lhs``, some ``Y -> a`` with
    ``Y ⊆ X``. A reported FD may be too general if no sampled pair
    refuted it; more rounds tighten it. Deterministic for fixed data and
    parameters. Pass ``stats={}`` to receive ``{"rounds", "agree_sets",
    "converged"}``."""
    cols = sorted(columns or df.columns)

    # constants are exact and cheap (one job), as in the reference's
    # single-column pre-pass
    cd = distinct_counts(df, [(c,) for c in cols], exact=True)
    constant = {c for c in cols if cd[(c,)] <= 1}
    fds: list[tuple[tuple[str, ...], str]] = [((), c) for c in sorted(constant)]

    seen: set[frozenset[str]] = set()
    cover: list[frozenset[str]] = []
    rounds = 0
    converged = False
    for d in range(1, max_rounds + 1):
        rounds = d
        got = sample_agree_sets(
            df, cols, max_agree_sets=max_agree_sets, offset=d,
            content_order=True,
        )
        fresh = [a for a, _cnt in got if a not in seen]
        if not fresh:
            converged = True
            break
        seen.update(fresh)
        cover.extend(fresh)

    # inductor: keep the minimal non-refuted LHS per RHS (hyfd.py logic,
    # validator absent by design)
    cands: dict[str, set[frozenset[str]]] = {
        a: {frozenset()} for a in cols if a not in constant
    }
    for aset in sorted(cover, key=len):
        for a in cols:
            if a in aset or a not in cands:
                continue
            refuted = [c for c in cands[a] if c <= aset]
            for c in refuted:
                cands[a].discard(c)
                for child in _specialize(c, a, aset, cols, max_lhs):
                    _insert_minimal(cands[a], child)

    for a, cs in cands.items():
        # ∅ surviving the sampled cover only means no sampled pair differed
        # on a; the exact constants pre-pass already refuted ∅ -> a, so
        # specialize it to singletons (hyfd's level-0 rule) instead of
        # either claiming a constant or dropping the RHS entirely
        if frozenset() in cs:
            cs.discard(frozenset())
            for b in cols:
                if b != a and b not in constant:
                    _insert_minimal(cs, frozenset({b}))
        for c in cs:
            if c and not (c & constant):
                fds.append((tuple(sorted(c)), a))

    if stats is not None:
        stats["rounds"] = rounds
        stats["agree_sets"] = len(seen)
        stats["converged"] = converged
    return sorted(fds)
