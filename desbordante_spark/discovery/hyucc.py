"""Hybrid (HyUCC-style) UCC discovery — sample-driven negative cover +
batched lattice validation.

Reference: HyUCC transplants the HyFD machinery to unique column
combinations (/root/reference/src/core/algorithms/ucc/hyucc/, 761 LoC;
Papenbrock & Naumann, 2017): a Sampler collects agree sets from
cluster-neighbor row pairs, each agree set A refutes every UCC candidate
X with X ⊆ A (the witness pair collides on all of X), and a Validator
exactly checks only the candidates that survive. The reference pins
HyUCC's output to the UCC verifier's results (test_ucc_verifier.cpp:
96-123) — same contract here: identical output to the levelwise
``tane.discover_uccs``.

Spark-first mapping (shared with ``discovery/hyfd.py``):

- **Sampler**: ``sample_agree_sets`` — one exploded frame, one window,
  heavy clusters salted, bounded driver collect.
- **Inductor**: driver-side antichain of column-index sets. Refuting A
  specializes X by one column OUTSIDE A (adding a column the witness pair
  agrees on cannot break the collision) — the antichain always covers
  every true minimal UCC.
- **Validator**: one batched ``distinct_counts`` job per level over only
  the surviving candidates; ``X`` is a UCC iff ``|π_X| = n``. A failed
  candidate specializes with every column; supersets of confirmed UCCs
  are pruned (minimality).

Results are EXACT (every reported UCC passed an exact distinct-count
check); sampling only decides how much of the lattice the validator can
skip — pass ``stats={}`` for the concrete lattice-skip evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from desbordante_spark.discovery.hyfd import _insert_minimal, sample_agree_sets
from desbordante_spark.discovery.tane import approx_tolerance, distinct_counts

__all__ = ["discover_uccs_hybrid"]


def _specialize(
    cand: frozenset[str],
    avoid: frozenset[str],
    cols: list[str],
    max_size: int,
) -> list[frozenset[str]]:
    if len(cand) >= max_size:
        return []
    return [cand | {b} for b in cols if b not in cand and b not in avoid]


def discover_uccs_hybrid(
    df: DataFrame,
    columns: list[str] | None = None,
    max_size: int = 3,
    max_agree_sets: int = 10_000,
    exact: bool = True,
    stats: dict | None = None,
) -> list[tuple[str, ...]]:
    """All minimal unique column combinations up to ``max_size`` columns —
    identical output to ``tane.discover_uccs`` (sorted by size, then
    lexically), via the HyUCC hybrid strategy.

    ``exact=False`` sketch-prunes the validator's distinct counts and
    exactly confirms only plausible keys (same two-phase contract as
    ``tane.discover_uccs``). Pass ``stats={}`` to receive
    ``{"agree_sets", "validated_candidates", "full_lattice_candidates"}``.
    """
    from math import comb

    cols = sorted(columns or df.columns)
    n = df.count()
    tol = approx_tolerance()
    n_validated = 0

    # ---- Sampler + Inductor: refute candidates with sampled agree sets
    agree_sets = sample_agree_sets(df, cols, max_agree_sets)
    cands: set[frozenset[str]] = {frozenset({c}) for c in cols}
    for aset, _cnt in sorted(agree_sets, key=lambda x: len(x[0])):
        refuted = [c for c in cands if c <= aset]
        for c in refuted:
            cands.discard(c)
            for child in _specialize(c, aset, cols, max_size):
                _insert_minimal(cands, child)

    # ---- Validator: levelwise batched exact checks of the survivors
    uccs: list[tuple[str, ...]] = []
    ucc_sets: list[frozenset[str]] = []
    cd: dict[tuple[str, ...], int] = {}
    for level in range(1, max_size + 1):
        todo = sorted(
            (c for c in cands if len(c) == level),
            key=lambda c: tuple(sorted(c)),
        )
        if not todo:
            continue
        need = sorted(
            {tuple(sorted(c)) for c in todo} - cd.keys()
        )
        cd.update(distinct_counts(df, need, exact, n_rows=n))
        if not exact:
            # exact-confirm every count the sketch can't distinguish
            # from n (the key decision needs exactness; a non-key's
            # sketch undercount is harmless)
            maybe = sorted(
                s for s in (tuple(sorted(c)) for c in todo)
                if cd[s] >= n * (1 - tol)
            )
            cd.update(distinct_counts(df, maybe, exact=True, n_rows=n))
        for c in todo:
            n_validated += 1
            cands.discard(c)
            s = tuple(sorted(c))
            if any(u < c for u in ucc_sets):
                continue  # proper superset of a found UCC: non-minimal
            if cd[s] == n:
                uccs.append(s)
                ucc_sets.append(c)
            else:
                for child in _specialize(c, frozenset(), cols, max_size):
                    if any(u <= child for u in ucc_sets):
                        continue
                    _insert_minimal(cands, child)
    if stats is not None:
        m = len(cols)
        stats["agree_sets"] = len(agree_sets)
        stats["validated_candidates"] = n_validated
        stats["full_lattice_candidates"] = sum(
            comb(m, k) for k in range(1, max_size + 1)
        )
    return sorted(uccs, key=lambda s: (len(s), s))
