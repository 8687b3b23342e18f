"""AUCC discovery — PyroUCC-style levelwise search with pair-based error.

Reference: PyroUCC mines approximate unique column combinations by adapting
Pyro's sample-driven error estimation + lattice traversal to the uniqueness
task (/root/reference/src/core/algorithms/ucc/pyroucc/; Pyro itself at
fd/pyro/pyro.h:13-31). The error measure matches the repo's AUCC verifier:
``error(X) = Σ_clusters c·(c−1) / (n·(n−1))`` (equal-pair fraction,
operators/ucc.py).

Spark-first: ALL candidates of a level are scored in ONE job — each row
explodes to ``(candidate_id, key)`` tuples, one two-level aggregation
computes every candidate's equal-pair mass simultaneously (map-side combine
bounds the shuffle by distinct keys). The Pyro idea appears as
``sample_fraction``: candidates are first scored on a row sample
(same batched job shape, much less data) and only those whose ESTIMATED
error is within ``sample_margin`` of qualifying are re-scored exactly —
every reported AUCC carries an exact error; the (documented) probabilistic
risk is pruning a true AUCC whose sample estimate landed far above the
threshold.

Equal-pair sums are exact BIGINTs (oracle-parity convention, CLAUDE.md);
under ANSI mode a sum beyond int64 (a single ≳3·10⁹-row duplicate cluster)
fails loudly rather than silently wrapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from desbordante_spark.discovery.common import content_sample, pair_mass_level

__all__ = ["discover_auccs"]


def discover_auccs(
    df: DataFrame,
    columns: list[str] | None = None,
    max_size: int = 2,
    max_error: float = 0.01,
    sample_fraction: float | None = None,
    sample_margin: float = 0.05,
) -> list[tuple[tuple[str, ...], float]]:
    """All minimal AUCCs up to ``max_size`` columns: column sets whose
    equal-pair error ≤ ``max_error``. Returns sorted
    ``[(column_tuple, error), ...]``; exact UCCs appear with error 0.0.

    Minimality: a qualifying set prunes its supersets (the error measure is
    monotone non-increasing in the column set — adding a column only splits
    clusters). ``sample_fraction`` enables the Pyro two-phase (see module
    docstring)."""
    cols = sorted(columns or df.columns)
    out: list[tuple[tuple[str, ...], float]] = []
    qualifying: list[tuple[str, ...]] = []
    candidates: list[tuple[str, ...]] = [(c,) for c in cols]
    sample = (
        content_sample(df, sample_fraction)
        if sample_fraction is not None and sample_fraction < 1.0
        else None
    )
    for _level in range(1, max_size + 1):
        if not candidates:
            break
        todo = candidates
        if sample is not None:
            est = pair_mass_level(sample, todo)
            kept = []
            for i, s in enumerate(todo):
                ep, m = est.get(i, (0, 0))
                e = ep / (m * (m - 1)) if m > 1 else 0.0
                if e <= max_error + sample_margin:
                    kept.append(s)
            todo = kept
        scores = pair_mass_level(df, todo) if todo else {}
        failed = set(candidates) - set(todo)
        for i, s in enumerate(todo):
            ep, n = scores[i]
            err = ep / (n * (n - 1)) if n > 1 else 0.0
            if err <= max_error:
                out.append((s, err))
                qualifying.append(s)
            else:
                failed.add(s)
        nxt = set()
        for s in failed:
            for c in cols:
                if c <= s[-1]:
                    continue
                cand = tuple(sorted({*s, c}))
                if any(set(q) <= set(cand) for q in qualifying):
                    continue  # minimality
                nxt.add(cand)
        candidates = sorted(nxt)
    return sorted(out)
