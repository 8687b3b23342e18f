"""FD / UCC discovery — TANE-style levelwise search, Spark-batched.

Reference: TANE mines all minimal FDs/UCCs by levelwise lattice traversal
with PLI refinement (/root/reference/src/core/algorithms/fd/tane/, ~690 LoC;
candidate pruning via found FDs and keys). The decision primitive is
``X → A  iff  |π_X| == |π_{X∪A}|`` (partition cardinality equality).

Spark-first: partition cardinalities are exact distinct counts over the
candidate key sets. A level's candidates are evaluated in pair-mass-
budgeted batches of the Expand-free unpivoted single-distinct job
(``common.distinct_count_level`` — batching ``count_distinct`` aggregates
into one ``agg`` makes Catalyst plan a per-aggregate Expand, measured 15×
slower at 11 candidates); the driver loop only generates candidates and
prunes, never touches data. For wide tables at extreme scale, swap
``exact=False`` to prune with HLL++ sketches (``approx_count_distinct`` —
sketch aggregates don't Expand, so they stay one ``agg``) and confirm only
the surviving equalities exactly — the HyFD-style two-phase trade.

The lattice bookkeeping (candidate generation, minimality pruning, key
pruning) follows TANE's rules:
- X → A is reported only if no proper subset Y ⊂ X has Y → A (minimality).
- If X is a key (|π_X| = n), every X → A holds; X's own FDs are reported
  when minimal (reference parity — README's university_fd output includes
  key LHS like [Classroom Semester] -> Professor) and X's proper supersets
  are pruned (their FDs are implied, never minimal).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["discover_fds", "discover_uccs", "distinct_counts",
           "approx_tolerance"]

#: HLL++ relative standard deviation used for the sketch-prune phase
#: (Spark's approx_count_distinct default).
_DEFAULT_RSD = 0.05

#: how many sketch standard deviations of slack the prune keeps before it
#: dares reject a candidate without exact confirmation
_PRUNE_SIGMAS = 4.0


def approx_tolerance(rsd: float = _DEFAULT_RSD,
                     sigmas: float = _PRUNE_SIGMAS) -> float:
    """Sketch-prune slack derived from the configured HLL++ ``rsd``.

    A candidate equality ``|π_X| == |π_{X∪A}|`` is rejected WITHOUT exact
    confirmation only when the two sketch counts differ by more than
    ``sigmas·rsd`` of the larger, after allowing ``sigmas·rsd`` error on each
    side: tolerance = 1 − (1 − sigmas·rsd)/(1 + sigmas·rsd). With the
    defaults (rsd=0.05, 4σ) that is ≈ 0.333. HLL++ error is ~Gaussian, so
    the probability a true equality is wrongly pruned is the chance either
    sketch errs beyond 4σ — ≲ 1.3e-4 per candidate pair (union bound over
    the lattice applies; pass a smaller ``rsd`` to tighten). ``exact=True``
    has no such bound and is fully exact."""
    s = sigmas * rsd
    if s >= 1.0:
        return 1.0
    return 1.0 - (1.0 - s) / (1.0 + s)


#: exploded-rows-per-job budget for the exact path (chunk =
#: budget // n_rows, the discovery/common.py batching policy)
_EXACT_PAIR_MASS_BUDGET = 40_000_000


def distinct_counts(
    df: DataFrame,
    column_sets: list[tuple[str, ...]],
    exact: bool = True,
    rsd: float = _DEFAULT_RSD,
    n_rows: int | None = None,
) -> dict[tuple[str, ...], int]:
    """Exact (or HLL-approximate) distinct counts for many column sets.

    The approx path stays ONE ``agg`` of ``approx_count_distinct`` sketches
    (no Expand — only exact DISTINCT aggregates trigger Catalyst's per-
    aggregate row replication). The exact path routes through the
    Expand-free unpivoted single-distinct job (``common.distinct_count_
    level`` — multiple ``count_distinct`` in one agg measured 15× slower
    at 11 candidates on this host), chunked so one job's exploded volume
    stays near the pair-mass budget when ``n_rows`` is known."""
    if not column_sets:
        return {}
    if exact:
        from desbordante_spark.discovery.common import distinct_count_level

        if n_rows:
            chunk = max(1, _EXACT_PAIR_MASS_BUDGET // n_rows)
        else:
            chunk = len(column_sets)
        out: dict[tuple[str, ...], int] = {}
        for lo in range(0, len(column_sets), chunk):
            part = column_sets[lo:lo + chunk]
            got = distinct_count_level(df, part)
            for i, cols in enumerate(part):
                out[cols] = got[i]
        return out
    aggs = []
    for i, cols in enumerate(column_sets):
        key = F.struct(*[F.col(c) for c in cols])
        aggs.append(F.approx_count_distinct(key, rsd).alias(f"c{i}"))
    row = df.agg(*aggs).collect()[0]
    return {cols: int(row[f"c{i}"]) for i, cols in enumerate(column_sets)}


def discover_uccs(
    df: DataFrame,
    columns: list[str] | None = None,
    max_size: int = 3,
    exact: bool = True,
    rsd: float = _DEFAULT_RSD,
    stats: dict | None = None,
) -> list[tuple[str, ...]]:
    """All minimal unique column combinations up to ``max_size`` columns.

    ``exact=False`` is the scale path: the level's candidates are first
    scored with HLL++ sketches (no Expand blowup), and only the candidates
    the sketch can't rule out (approx count within ``approx_tolerance(rsd)``
    of n) are re-counted exactly. Every REPORTED UCC is exact (it passed an
    exact count); what is probabilistic is pruning — a true UCC is missed
    only if its sketch errs beyond ~4σ (P ≲ 1.3e-4 per candidate, see
    ``approx_tolerance``). ``exact=True`` is fully exact."""
    cols = columns or df.columns
    tol = approx_tolerance(rsd)
    n = df.count()
    n_exact = 0
    n_sketch = 0
    uccs: list[tuple[str, ...]] = []
    candidates = [(c,) for c in cols]
    for _level in range(1, max_size + 1):
        if not candidates:
            break
        cd = distinct_counts(df, candidates, exact, rsd, n_rows=n)
        if exact:
            n_exact += len(candidates)
        else:
            n_sketch += len(candidates)
        if not exact:
            maybe = [s for s in candidates
                     if cd[s] >= n * (1 - tol)]
            cd.update(distinct_counts(df, maybe, exact=True, n_rows=n))
            n_exact += len(maybe)
            # non-confirmed candidates keep their (under-n) sketch counts —
            # only the key decision below needs exactness
        keys = [s for s in candidates if cd[s] == n]
        uccs.extend(keys)
        survivors = [s for s in candidates if cd[s] < n]
        nxt = set()
        for s in survivors:
            for c in cols:
                if c <= s[-1]:
                    continue
                cand = tuple(sorted({*s, c}))
                # prune supersets of found UCCs (minimality)
                if any(set(u) <= set(cand) for u in uccs):
                    continue
                nxt.add(cand)
        candidates = sorted(nxt)
    if stats is not None:
        stats["exact_scored"] = n_exact
        stats["sketch_scored"] = n_sketch
    return uccs


def discover_fds(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
    exact: bool = True,
    rsd: float = _DEFAULT_RSD,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """All minimal exact FDs ``X -> A`` with ``|X| <= max_lhs``.

    Returns ``[(lhs_tuple, rhs_col), ...]`` sorted. Constant columns yield
    ``() -> A`` (the reference reports these as FDs with empty LHS).
    ``exact=False`` = sketch-prune + exact-confirm two-phase (see
    ``discover_uccs``): every REPORTED FD passed an exact count; pruning is
    probabilistic — a true FD is dropped only if a sketch errs beyond
    ``approx_tolerance(rsd)`` (~4σ, P ≲ 1.3e-4 per candidate pair). The
    Expand-heavy exact job runs only on the sketch survivors."""
    cols = sorted(columns or df.columns)
    tol = approx_tolerance(rsd)
    n = df.count()
    n_exact = 0
    n_sketch = 0
    fds: list[tuple[tuple[str, ...], str]] = []
    found: dict[str, list[tuple[str, ...]]] = {c: [] for c in cols}

    # level 0: constant columns
    cd = distinct_counts(df, [(c,) for c in cols], exact, rsd, n_rows=n)
    if exact:
        n_exact += len(cols)
    else:
        n_sketch += len(cols)
    for c in cols:
        if cd[(c,)] <= 1:
            fds.append(((), c))
            found[c].append(())

    keys: list[tuple[str, ...]] = []
    level_sets = [(c,) for c in cols]
    cd_cache: dict[tuple[str, ...], int] = dict(cd)

    for level in range(1, max_lhs + 1):
        lhs_sets = [s for s in level_sets if len(s) == level]
        # drop LHS sets that are supersets of keys (their FDs are implied)
        lhs_sets = [s for s in lhs_sets if not any(set(k) <= set(s) for k in keys)]
        if not lhs_sets:
            break
        # needed cardinalities: every lhs set + every (lhs ∪ {rhs}) extension
        need = set()
        pairs = []
        for s in lhs_sets:
            if s not in cd_cache:
                need.add(s)
            for a in cols:
                if a in s:
                    continue
                if any(set(prev) <= set(s) for prev in found[a]):
                    continue  # minimality: subset already determines a
                ext = tuple(sorted({*s, a}))
                pairs.append((s, a, ext))
                if ext not in cd_cache:
                    need.add(ext)
        cd_cache.update(distinct_counts(df, sorted(need), exact, rsd,
                                        n_rows=n))
        if exact:
            n_exact += len(need)
        else:
            n_sketch += len(need)
        if not exact:
            # two-phase (HyFD-style): the sketch only PRUNES — every
            # candidate equality it can't rule out is re-counted exactly in
            # one batched job, so every REPORTED FD/key is exact; the
            # (documented, ~4σ) risk is a wrongly-pruned true equality
            confirm: set[tuple[str, ...]] = set()
            for s in lhs_sets:
                if cd_cache.get(s, 0) >= n * (1 - tol):
                    confirm.add(s)
            for s, a, ext in pairs:
                lo, hi = sorted((cd_cache[s], cd_cache[ext]))
                if lo >= hi * (1 - tol):
                    confirm.add(s)
                    confirm.add(ext)
            cd_cache.update(
                distinct_counts(df, sorted(confirm), exact=True, n_rows=n)
            )
            n_exact += len(confirm)
        for s in lhs_sets:
            if cd_cache.get(s) == n:
                keys.append(s)
        for s, a, ext in pairs:
            if any(set(k) < set(s) for k in keys):
                continue  # PROPER superset of a key: implied, non-minimal
            if cd_cache[s] == cd_cache[ext]:
                fds.append((s, a))
                found[a].append(s)
        # next level candidates
        nxt = set()
        for s in lhs_sets:
            for c in cols:
                if c <= s[-1]:
                    continue
                nxt.add(tuple(sorted({*s, c})))
        level_sets = sorted(nxt)
    if stats is not None:
        stats["exact_scored"] = n_exact
        stats["sketch_scored"] = n_sketch
    return sorted(fds)
