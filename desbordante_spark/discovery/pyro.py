"""Pyro-style AFD discovery — estimate-driven ascend/descend traversal.

Reference: Pyro (/root/reference/src/core/algorithms/fd/pyro/pyro.h:13-31,
~2,930 LoC; Kruse & Naumann, VLDB'18) searches each RHS's LHS lattice with
sample-based error ESTIMATES: ascend from a launchpad toward the estimated
dependency boundary, validate the endpoint exactly, trickle down to the
minimal dependency, then re-launch from the minimal hitting sets of the
uncovered space. Loose error thresholds make the boundary shallow and the
traversal visits FAR fewer nodes than levelwise search, which scores every
non-pruned candidate of every level.

Spark-first mapping:

- **Estimates** are batched ``_score_level`` jobs over a content-hash row
  sample (`discovery/common.py::content_sample` — deterministic, layout-
  independent); **exact checks** are the same batched job over the full
  frame. Estimates only STEER the walk — every classification decision
  (dependency / non-dependency, minimality) uses an exact score, so the
  output is IDENTICAL to the levelwise miner's on every input, not just in
  expectation (stronger than the two-phase sampler, whose pruning is
  probabilistic).
- **Lockstep rounds**: all RHS searches advance together; each round
  merges every search's estimate requests into ONE sample job and every
  exact request into ONE full-data job (the DFD lockstep pattern,
  discovery/dfd.py). Driver state is column-set bookkeeping only.
- **Coverage algebra** (the reference's SearchSpace/launchpad machinery,
  pyro.h + search_space.cpp): a set X is CLASSIFIED when X ⊇ some minimal
  dependency (qualifies, non-minimal) or X ⊆ some known exact
  non-dependency (fails — sound because ``g1`` and ``per_tuple`` are
  monotone non-increasing in the LHS; ``per_value`` is NOT anti-monotone
  — splitting a cluster can raise the equal-weight per-cluster average —
  so this miner delegates ``per_value`` to the levelwise enumeration,
  whose minimality pruning is definitional and measure-agnostic).
  New launchpads are the minimal hitting sets of
  ``{U \\ N : N ∈ non_deps}`` not covering a found dependency — computed
  on the driver over column indices, never data.

Error semantics, measures, and minimality match
``pfdtane.discover_afds`` exactly (shared ``_score_level``).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame

from desbordante_spark.discovery.pfdtane import _score_level

__all__ = ["discover_afds_auto", "discover_afds_pyro"]


def _antichain_add_max(sets: list[frozenset], new: frozenset) -> None:
    """Keep ``sets`` an antichain of MAXIMAL elements."""
    for s in sets:
        if new <= s:
            return
    sets[:] = [s for s in sets if not s < new]
    sets.append(new)


def _min_hitting_sets(
    families: list[frozenset[str]], universe: list[str], max_size: int
) -> list[frozenset[str]]:
    """All minimal hitting sets of ``families`` with size ≤ ``max_size``
    (driver-side, column names only). Empty family list → the empty set.

    Driver cost: branching is bounded by the size-``max_size`` cap (the
    reference pays the same driver-side price in its SearchSpace
    launchpad algebra); at the widths dependency discovery is run at
    (tens of columns, small max_lhs) this is microseconds, and it never
    touches data."""
    out: list[frozenset[str]] = []

    def rec(chosen: frozenset[str], remaining: list[frozenset[str]]) -> None:
        remaining = [f for f in remaining if not (f & chosen)]
        if not remaining:
            if not any(m < chosen for m in out):
                out[:] = [m for m in out if not (chosen < m)]
                if chosen not in out:
                    out.append(chosen)
            return
        if len(chosen) >= max_size:
            return
        # branch on the smallest uncovered family (standard HS heuristic)
        fam = min(remaining, key=len)
        for el in sorted(fam):
            rec(chosen | {el}, remaining)

    rec(frozenset(), families)
    # the recursion can emit non-minimal sets before a smaller one is
    # found on a later branch — final antichain sweep
    return [m for m in out if not any(o < m for o in out)]


class _RhsSearch:
    """One RHS's traversal state (driver-only bookkeeping)."""

    def __init__(self, rhs: str, cols: list[str], max_lhs: int):
        self.rhs = rhs
        self.attrs = [c for c in cols if c != rhs]
        self.max_lhs = max_lhs
        self.min_deps: list[frozenset[str]] = []
        self.non_deps: list[frozenset[str]] = []  # maximal exact failures
        self.launchpads: list[frozenset[str]] = []
        self.nodes: list[frozenset[str]] = []  # concurrent ascent nodes
        self.trickles: list[frozenset[str]] = []  # exact deps descending
        self.done = False

    # ---- coverage tests --------------------------------------------------
    def covered_dep(self, x: frozenset[str]) -> bool:
        return any(d <= x for d in self.min_deps)

    def covered_non(self, x: frozenset[str]) -> bool:
        return any(x <= n for n in self.non_deps)

    def relaunch(self) -> None:
        """Recompute launchpads = minimal hitting sets of the non-dep
        complements, minus dependency-covered sets; empty → search done."""
        u = frozenset(self.attrs)
        fams = [u - n for n in self.non_deps]
        if any(not f for f in fams):  # some non-dep covers the whole space
            self.done = True
            return
        pads = _min_hitting_sets(fams, self.attrs, self.max_lhs)
        self.launchpads = [p for p in pads if not self.covered_dep(p)]
        if not self.launchpads:
            self.done = True


def discover_afds_pyro(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
    max_error: float = 0.05,
    error_measure: str = "per_tuple",
    sample_fraction: float = 0.1,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str, float]]:
    """All minimal AFDs ``X -> A`` with error ≤ ``max_error`` and
    ``|X| <= max_lhs`` — IDENTICAL output to ``pfdtane.discover_afds``
    (same measures, same minimality), found by Pyro's estimate-guided
    boundary traversal instead of levelwise enumeration (``per_value``
    is served by the levelwise miner directly — the traversal's coverage
    pruning needs an anti-monotone measure; see module docstring).

    Pass ``stats={}`` to receive ``{"exact_scored", "estimate_scored",
    "rounds"}`` — the node-visit evidence (compare ``exact_scored``
    against the levelwise miner's candidate count)."""
    if error_measure not in ("per_tuple", "per_value", "g1"):
        raise ValueError(f"unknown error_measure {error_measure!r}")
    if error_measure == "per_value":
        # per_value is not anti-monotone (see module docstring): the
        # covered_non prune and trickle-down minimization would be unsound.
        # Delegate to the levelwise miner — identical semantics, exact.
        from desbordante_spark.discovery.pfdtane import discover_afds

        lw_stats: dict = {}
        out = discover_afds(
            df, columns=columns, max_lhs=max_lhs, max_error=max_error,
            error_measure=error_measure, stats=lw_stats,
        )
        if stats is not None:
            stats["exact_scored"] = lw_stats.get("exact_scored", 0)
            stats["estimate_scored"] = lw_stats.get("estimate_scored", 0)
            stats["rounds"] = 0
            stats["fallback"] = "levelwise_per_value"
        return out
    from desbordante_spark.discovery.common import content_sample

    cols = sorted(columns or df.columns)
    thr = float(max_error)
    sample = (
        content_sample(df, sample_fraction)
        if sample_fraction is not None and 0.0 < sample_fraction < 1.0
        else None
    )
    exact_cache: dict[tuple[tuple[str, ...], str], float] = {}
    est_cache: dict[tuple[tuple[str, ...], str], float] = {}
    n_exact = 0
    n_est = 0
    n_rounds = 0

    def run_batch(
        reqs: list[tuple[tuple[str, ...], str]], exact: bool
    ) -> None:
        nonlocal n_exact, n_est
        cache = exact_cache if exact else est_cache
        todo = sorted({r for r in reqs if r not in cache})
        if not todo:
            return
        frame = df if exact or sample is None else sample
        scores = _score_level(frame, [(list(s), a) for s, a in todo],
                              error_measure)
        for i, key in enumerate(todo):
            cache[key] = scores[i]
        if exact:
            n_exact += len(todo)
        else:
            n_est += len(todo)

    def est(s: frozenset[str], a: str) -> float:
        if sample is None:
            return exact_cache[(tuple(sorted(s)), a)]
        return est_cache[(tuple(sorted(s)), a)]

    def exact(s: frozenset[str], a: str) -> float:
        return exact_cache[(tuple(sorted(s)), a)]

    searches = [_RhsSearch(a, cols, max_lhs) for a in cols]

    # ---- level 0: exact ∅ -> a for every rhs, one batched job
    run_batch([((), s.rhs) for s in searches], exact=True)
    afds: list[tuple[tuple[str, ...], str, float]] = []
    for s in searches:
        e = exact(frozenset(), s.rhs)
        if e <= thr:
            afds.append(((), s.rhs, e))
            s.done = True  # every LHS is a superset of ∅: nothing minimal left
        else:
            s.non_deps.append(frozenset())
            s.relaunch()  # → singleton launchpads

    # ---- lockstep rounds: every search advances ALL its ascents and
    # trickle-downs each round (launchpads ascend concurrently), and all
    # searches' requests merge into ≤1 estimate + ≤2 exact jobs per round
    def _key(x: frozenset[str]) -> tuple[str, ...]:
        return tuple(sorted(x))

    while any(not s.done for s in searches):
        n_rounds += 1
        est_reqs: list[tuple[tuple[str, ...], str]] = []
        exact_reqs: list[tuple[tuple[str, ...], str]] = []
        plans: list[tuple[_RhsSearch, list, list]] = []
        for s in searches:
            if s.done:
                continue
            # refill: every fresh pad becomes a concurrent ascent
            fresh = [
                p for p in s.launchpads
                if not (s.covered_dep(p) or s.covered_non(p))
                and p not in s.nodes
            ]
            s.launchpads = []
            s.nodes = list(dict.fromkeys([*s.nodes, *fresh]))
            if not s.nodes and not s.trickles:
                s.relaunch()
                if s.done:
                    continue
                s.nodes = list(s.launchpads)
                s.launchpads = []
            t_plans = []
            for t in sorted(s.trickles, key=_key):
                gens = [
                    t - {x} for x in sorted(t)
                    if not s.covered_non(t - {x})
                ]
                exact_reqs += [(_key(g), s.rhs) for g in gens]
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
                reqs.append((_key(node), s.rhs))
                reqs += [(_key(c), s.rhs) for c in children]
                a_plans.append((node, children))
            plans.append((s, t_plans, a_plans))

        run_batch(est_reqs, exact=False)
        run_batch(exact_reqs, exact=True)

        # decision wave; endpoint classifications need one more exact batch
        confirm_reqs: list[tuple[tuple[str, ...], str]] = []
        endpoints: list[tuple[_RhsSearch, frozenset]] = []
        for s, t_plans, a_plans in plans:
            new_trickles: list[frozenset[str]] = []
            for t, gens in t_plans:
                qual = [g for g in gens if exact(g, s.rhs) <= thr]
                for g in gens:
                    if exact(g, s.rhs) > thr:
                        _antichain_add_max(s.non_deps, g)
                if qual:
                    # descend into the best (lowest-error) generalization;
                    # other qualifying branches are reached by later
                    # relaunches (their regions stay uncovered until a
                    # minimal dependency below them is recorded)
                    new_trickles.append(min(
                        qual,
                        key=lambda g: (exact(g, s.rhs), _key(g)),
                    ))
                elif not s.covered_dep(t):
                    # no generalization qualifies exactly: t is minimal
                    # (covered_dep guards a twin trickle landing on t
                    # earlier in this same wave)
                    s.min_deps.append(t)
                    afds.append((_key(t), s.rhs, exact(t, s.rhs)))
            s.trickles = list(dict.fromkeys(new_trickles))
            new_nodes: list[frozenset[str]] = []
            for node, children in a_plans:
                if s.covered_dep(node) or s.covered_non(node):
                    continue  # covered by a trickle decision this wave
                if est(node, s.rhs) <= thr or not children:
                    # estimated boundary reached (or nowhere left to
                    # climb): classify the node exactly
                    confirm_reqs.append((_key(node), s.rhs))
                    endpoints.append((s, node))
                else:
                    new_nodes.append(min(
                        children,
                        key=lambda c: (est(c, s.rhs), _key(c)),
                    ))
            s.nodes = list(dict.fromkeys(new_nodes))

        run_batch(confirm_reqs, exact=True)
        for s, node in endpoints:
            if s.covered_dep(node) or s.covered_non(node):
                continue
            if exact(node, s.rhs) <= thr:
                if node not in s.trickles:
                    s.trickles.append(node)  # exact dependency: minimize
            else:
                _antichain_add_max(s.non_deps, node)

    if stats is not None:
        stats["exact_scored"] = n_exact
        stats["estimate_scored"] = n_est
        stats["rounds"] = n_rounds
    return sorted(afds)


def discover_afds_auto(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
    max_error: float = 0.05,
    error_measure: str = "per_tuple",
    sample_fraction: float = 0.1,
    dense_threshold: float = 0.15,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str, float]]:
    """AFD discovery with automatic search-strategy selection — the
    operational form of BENCH.md's lattice-skip guidance ("pick the miner
    per expected boundary depth"; measured there on 1M-row frames:
    traversal 3.3x fewer exact scores in the deep key-plus-noise regime,
    levelwise faster in the boundary-DENSE regime where most minimal AFDs
    sit at levels 1-2 and the traversal's estimate jobs buy nothing).

    Probe: ONE batched exact job scores every level-1 candidate (work the
    chosen strategy would redo anyway — the probe's only overhead is that
    single redundant level). Boundary density = the fraction of level-1
    candidates that already qualify at ``max_error``. Decision:

    - ``max_lhs <= 1``: the probe IS the whole lattice — answer directly;
    - density >= ``dense_threshold``: LEVELWISE (many shallow minimal
      AFDs; minimality pruning is near-optimal, estimate steering is
      overhead);
    - otherwise: the Pyro TRAVERSAL (sparse shallow boundary — deps
      settle low or sit deep, the regime the ascend/trickle-down walk is
      designed to skip through);
    - ``per_value`` always goes levelwise (not anti-monotone — the
      traversal's coverage pruning would be unsound, see module
      docstring).

    Output is IDENTICAL to ``pfdtane.discover_afds`` in every branch
    (both strategies are exact). ``stats`` records ``chosen``,
    ``density``, and the underlying miner's counters."""
    if error_measure not in ("per_tuple", "per_value", "g1"):
        raise ValueError(f"unknown error_measure {error_measure!r}")
    from desbordante_spark.discovery.pfdtane import discover_afds

    cols = sorted(columns or df.columns)
    inner: dict = {}
    if error_measure == "per_value":
        out = discover_afds(
            df, columns=cols, max_lhs=max_lhs, max_error=max_error,
            error_measure=error_measure, stats=inner,
        )
        if stats is not None:
            stats.update(chosen="levelwise_per_value", density=None,
                         **inner)
        return out

    cands = [((x,), a) for x in cols for a in cols if x != a]
    if max_lhs <= 1 or not cands:
        # max_lhs<=1: the probe WOULD score the whole lattice — skip it
        # and run levelwise once (no duplicated jobs). Single-column
        # frames have no level-1 candidates to probe at all.
        out = discover_afds(
            df, columns=cols, max_lhs=max_lhs, max_error=max_error,
            error_measure=error_measure, stats=inner,
        )
        if stats is not None:
            stats.update(chosen="levelwise", density=None, **inner)
        return out
    got = _score_level(df, cands, error_measure)
    n_dep1 = sum(1 for v in got.values() if v <= float(max_error))
    density = n_dep1 / len(cands)

    if density >= dense_threshold:
        out = discover_afds(
            df, columns=cols, max_lhs=max_lhs, max_error=max_error,
            error_measure=error_measure, stats=inner,
        )
        chosen = "levelwise"
    else:
        out = discover_afds_pyro(
            df, columns=cols, max_lhs=max_lhs, max_error=max_error,
            error_measure=error_measure, sample_fraction=sample_fraction,
            stats=inner,
        )
        chosen = "traversal"
    if stats is not None:
        stats.update(chosen=chosen, density=round(density, 4), **inner)
    return out
