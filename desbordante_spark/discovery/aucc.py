"""AUCC discovery — levelwise search plus the faithful PyroUCC traversal.

Reference: PyroUCC (/root/reference/src/core/algorithms/ucc/pyroucc/
pyroucc.cpp:18-114) is Pyro's estimate-guided SearchSpace run with a
SINGLE search space over the schema and a ``KeyG1Strategy`` target
(fd/pyrocommon/core/key_g1_strategy.h) instead of one space per FD RHS.
The error measure matches the repo's AUCC verifier:
``error(X) = Σ_clusters c·(c−1) / (n·(n−1))`` (equal-pair fraction,
operators/ucc.py) — the reference's key g1.

Two miners, identical output:

- ``discover_auccs`` — levelwise enumeration. ALL candidates of a level
  are scored in ONE job — each row explodes to ``(candidate_id, key)``
  tuples, one two-level aggregation computes every candidate's equal-pair
  mass simultaneously (map-side combine bounds the shuffle by distinct
  keys). ``sample_fraction`` adds a two-phase estimate→confirm pass with
  a documented probabilistic pruning risk (``sample_margin``).
- ``discover_auccs_pyro`` — the faithful traversal: ascend from
  launchpads toward the estimated error boundary, classify endpoints
  exactly, trickle down to the minimal AUCC, relaunch from the minimal
  hitting sets of the uncovered space (pyro.py's coverage algebra —
  key g1 is monotone non-increasing in the column set, so the
  subset/superset pruning is sound, unlike FD ``per_value``). Every
  classification uses an EXACT score, so the output is identical to the
  levelwise miner's on every input — not just in expectation.

Equal-pair sums are exact BIGINTs (oracle-parity convention, CLAUDE.md);
under ANSI mode a sum beyond int64 (a single ≳3·10⁹-row duplicate cluster)
fails loudly rather than silently wrapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from desbordante_spark.discovery.common import content_sample, pair_mass_level

__all__ = ["discover_auccs", "discover_auccs_auto", "discover_auccs_pyro"]


def discover_auccs(
    df: DataFrame,
    columns: list[str] | None = None,
    max_size: int = 2,
    max_error: float = 0.01,
    sample_fraction: float | None = None,
    sample_margin: float = 0.05,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], float]]:
    """All minimal AUCCs up to ``max_size`` columns: column sets whose
    equal-pair error ≤ ``max_error``. Returns sorted
    ``[(column_tuple, error), ...]``; exact UCCs appear with error 0.0.

    Minimality: a qualifying set prunes its supersets (the error measure is
    monotone non-increasing in the column set — adding a column only splits
    clusters). ``sample_fraction`` enables the Pyro two-phase (see module
    docstring). Pass ``stats={}`` to receive ``{"exact_scored",
    "estimate_scored"}`` node-visit counts."""
    cols = sorted(columns or df.columns)
    n_exact = n_est = 0
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
            n_est += len(todo)
            kept = []
            for i, s in enumerate(todo):
                ep, m = est.get(i, (0, 0))
                e = ep / (m * (m - 1)) if m > 1 else 0.0
                if e <= max_error + sample_margin:
                    kept.append(s)
            todo = kept
        scores = pair_mass_level(df, todo) if todo else {}
        n_exact += len(todo)
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
    if stats is not None:
        stats["exact_scored"] = n_exact
        stats["estimate_scored"] = n_est
    return sorted(out)


def discover_auccs_pyro(
    df: DataFrame,
    columns: list[str] | None = None,
    max_size: int = 2,
    max_error: float = 0.01,
    sample_fraction: float = 0.1,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], float]]:
    """All minimal AUCCs up to ``max_size`` columns — IDENTICAL output to
    ``discover_auccs`` (same error measure, same minimality), found by the
    faithful PyroUCC traversal: ONE search space over the schema
    (pyroucc.cpp:52-58 builds a single SearchSpace with KeyG1Strategy)
    running Pyro's estimate-guided ascend → exact classify → trickle-down
    → hitting-set relaunch loop (pyro.py's coverage algebra; key g1 is
    monotone non-increasing in the column set, so subset/superset pruning
    is sound). Estimates only STEER the walk — every classification uses
    an exact batched ``pair_mass_level`` score over the full frame, so the
    result carries exact errors and matches the levelwise miner on every
    input, not just in expectation.

    Pass ``stats={}`` to receive ``{"exact_scored", "estimate_scored",
    "rounds"}`` — compare ``exact_scored`` against the levelwise miner's
    candidate count for the node-visit evidence."""
    from desbordante_spark.discovery.pyro import _antichain_add_max, _RhsSearch

    cols = sorted(columns or df.columns)
    thr = float(max_error)
    sample = (
        content_sample(df, sample_fraction)
        if sample_fraction is not None and 0.0 < sample_fraction < 1.0
        else None
    )
    exact_cache: dict[tuple[str, ...], float] = {}
    est_cache: dict[tuple[str, ...], float] = {}
    n_exact = n_est = n_rounds = 0

    def run_batch(reqs: list[tuple[str, ...]], exact: bool) -> None:
        nonlocal n_exact, n_est
        cache = exact_cache if exact else est_cache
        todo = sorted({r for r in reqs if r not in cache})
        if not todo:
            return
        frame = df if exact or sample is None else sample
        scores = pair_mass_level(frame, todo)
        for i, key in enumerate(todo):
            ep, n = scores[i]
            cache[key] = ep / (n * (n - 1)) if n > 1 else 0.0
        if exact:
            n_exact += len(todo)
        else:
            n_est += len(todo)

    def _key(x: frozenset[str]) -> tuple[str, ...]:
        return tuple(sorted(x))

    def est(x: frozenset[str]) -> float:
        return (est_cache if sample is not None else exact_cache)[_key(x)]

    def exact(x: frozenset[str]) -> float:
        return exact_cache[_key(x)]

    # single search space; rhs=None keeps attrs = all columns. A UCC is a
    # NON-EMPTY vertical (the reference registers verticals, never the
    # empty set), so ∅ is seeded as a non-dependency unconditionally —
    # the relaunch then yields the singleton launchpads.
    s = _RhsSearch(None, cols, max_size)
    s.non_deps.append(frozenset())
    s.relaunch()
    auccs: list[tuple[tuple[str, ...], float]] = []

    while not s.done:
        n_rounds += 1
        est_reqs: list[tuple[str, ...]] = []
        exact_reqs: list[tuple[str, ...]] = []
        fresh = [
            p for p in s.launchpads
            if not (s.covered_dep(p) or s.covered_non(p)) and p not in s.nodes
        ]
        s.launchpads = []
        s.nodes = list(dict.fromkeys([*s.nodes, *fresh]))
        if not s.nodes and not s.trickles:
            s.relaunch()
            if s.done:
                break
            s.nodes = list(s.launchpads)
            s.launchpads = []
        t_plans = []
        for t in sorted(s.trickles, key=_key):
            # generalizations stay non-empty: a singleton trickle is
            # minimal by construction (no ∅ candidate to descend into)
            gens = [
                t - {x} for x in sorted(t)
                if len(t) > 1 and not s.covered_non(t - {x})
            ]
            exact_reqs += [_key(g) for g in gens]
            t_plans.append((t, gens))
        a_plans = []
        for node in sorted(s.nodes, key=_key):
            if s.covered_dep(node) or s.covered_non(node):
                continue  # covered since it was scheduled
            children = [
                node | {b}
                for b in s.attrs
                if b not in node
                and len(node) < s.max_lhs
                and not s.covered_dep(node | {b})
            ]
            reqs = est_reqs if sample is not None else exact_reqs
            reqs.append(_key(node))
            reqs += [_key(c) for c in children]
            a_plans.append((node, children))

        run_batch(est_reqs, exact=False)
        run_batch(exact_reqs, exact=True)

        new_trickles: list[frozenset[str]] = []
        for t, gens in t_plans:
            qual = [g for g in gens if exact(g) <= thr]
            for g in gens:
                if exact(g) > thr:
                    _antichain_add_max(s.non_deps, g)
            if qual:
                new_trickles.append(min(
                    qual, key=lambda g: (exact(g), _key(g)),
                ))
            elif not s.covered_dep(t):
                s.min_deps.append(t)
                auccs.append((_key(t), exact(t)))
        s.trickles = list(dict.fromkeys(new_trickles))
        confirm_reqs: list[tuple[str, ...]] = []
        endpoints: list[frozenset[str]] = []
        new_nodes: list[frozenset[str]] = []
        for node, children in a_plans:
            if s.covered_dep(node) or s.covered_non(node):
                continue  # covered by a trickle decision this wave
            if est(node) <= thr or not children:
                confirm_reqs.append(_key(node))
                endpoints.append(node)
            else:
                new_nodes.append(min(
                    children, key=lambda c: (est(c), _key(c)),
                ))
        s.nodes = list(dict.fromkeys(new_nodes))

        run_batch(confirm_reqs, exact=True)
        for node in endpoints:
            if s.covered_dep(node) or s.covered_non(node):
                continue
            if exact(node) <= thr:
                if node not in s.trickles:
                    s.trickles.append(node)  # exact AUCC: minimize it
            else:
                _antichain_add_max(s.non_deps, node)

    if stats is not None:
        stats["exact_scored"] = n_exact
        stats["estimate_scored"] = n_est
        stats["rounds"] = n_rounds
    return sorted(auccs)


def discover_auccs_auto(
    df: DataFrame,
    columns: list[str] | None = None,
    max_size: int = 2,
    max_error: float = 0.01,
    sample_fraction: float = 0.1,
    dense_threshold: float = 0.15,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], float]]:
    """AUCC discovery with automatic search-strategy selection — the AUCC
    analog of ``pyro.discover_afds_auto`` (BENCH.md's lattice-skip
    guidance: pick the miner per expected boundary depth).

    Probe: ONE batched exact job scores every singleton (work either
    strategy redoes anyway). Boundary density = the fraction of singletons
    already qualifying at ``max_error``. Qualifying singletons END their
    branches immediately (supersets are pruned by minimality), so a dense
    level 1 leaves levelwise near-optimal and the traversal's rounds pure
    overhead; a sparse level 1 means the boundary sits deep — the regime
    the estimate-steered walk skips through (BENCH_LATTICE.json ``aucc``:
    53 levelwise-scored vs 28 traversal-exact on the level-3/4 boundary).
    ``max_size <= 1`` answers from the probe path directly. Output is
    IDENTICAL in every branch; ``stats`` records ``chosen``, ``density``,
    and the underlying miner's counters."""
    cols = sorted(columns or df.columns)
    inner: dict = {}
    if max_size <= 1 or not cols:
        out = discover_auccs(
            df, columns=cols, max_size=max_size, max_error=max_error,
            stats=inner,
        )
        if stats is not None:
            stats.update(chosen="levelwise", density=None, **inner)
        return out
    got = pair_mass_level(df, [(c,) for c in cols])
    thr = float(max_error)
    n_q = 0
    for i in range(len(cols)):
        ep, n = got[i]
        err = ep / (n * (n - 1)) if n > 1 else 0.0
        if err <= thr:
            n_q += 1
    density = n_q / len(cols)
    if density >= dense_threshold:
        out = discover_auccs(
            df, columns=cols, max_size=max_size, max_error=max_error,
            stats=inner,
        )
        chosen = "levelwise"
    else:
        out = discover_auccs_pyro(
            df, columns=cols, max_size=max_size, max_error=max_error,
            sample_fraction=sample_fraction, stats=inner,
        )
        chosen = "traversal"
    if stats is not None:
        stats.update(chosen=chosen, density=round(density, 4), **inner)
    return out
