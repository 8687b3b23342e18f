"""FD / UCC discovery — TANE-style levelwise search, Spark-batched.

Reference: TANE mines all minimal FDs/UCCs by levelwise lattice traversal
with PLI refinement (/root/reference/src/core/algorithms/fd/tane/, ~690 LoC;
candidate pruning via found FDs and keys). The decision primitive is
``X → A  iff  |π_X| == |π_{X∪A}|`` (partition cardinality equality).

Spark-first: partition cardinalities are ``count_distinct(struct(X))``. All
candidate sets of a level are evaluated in ONE aggregation job (a single scan;
Catalyst expands multiple DISTINCT aggregates via Expand — a |candidates|×
row blowup that is the distributed price of exact levelwise discovery; the
driver loop only generates candidates and prunes, never touches data).
For wide tables at extreme scale, swap ``exact=False`` to prune with
HLL++ sketches (``approx_count_distinct``) and confirm only the surviving
equalities exactly — the HyFD-style two-phase trade.

The lattice bookkeeping (candidate generation, minimality pruning, key
pruning) follows TANE's rules:
- X → A is reported only if no proper subset Y ⊂ X has Y → A (minimality).
- If X is a key (|π_X| = n), every X → A holds; X is reported as a UCC and
  its supersets are pruned.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["discover_fds", "discover_uccs", "distinct_counts"]


def distinct_counts(
    df: DataFrame, column_sets: list[tuple[str, ...]], exact: bool = True
) -> dict[tuple[str, ...], int]:
    """Exact (or HLL-approximate) distinct counts for many column sets in
    one scan/job."""
    if not column_sets:
        return {}
    aggs = []
    for i, cols in enumerate(column_sets):
        key = F.struct(*[F.col(c) for c in cols])
        agg = (
            F.count_distinct(key) if exact else F.approx_count_distinct(key)
        )
        aggs.append(agg.alias(f"c{i}"))
    row = df.agg(*aggs).collect()[0]
    return {cols: int(row[f"c{i}"]) for i, cols in enumerate(column_sets)}


#: sketch-prune slack: HLL++ default rsd is ~5%, so a candidate whose
#: approximate count is within 15% of the target cannot be safely rejected
#: and goes to the exact confirmation pass
_APPROX_TOLERANCE = 0.15


def discover_uccs(
    df: DataFrame,
    columns: list[str] | None = None,
    max_size: int = 3,
    exact: bool = True,
) -> list[tuple[str, ...]]:
    """All minimal unique column combinations up to ``max_size`` columns.

    ``exact=False`` is the scale path: the level's candidates are first
    scored with HLL++ sketches (no Expand blowup), and only the candidates
    the sketch can't rule out (approx count within ``_APPROX_TOLERANCE`` of
    n) are re-counted exactly — results are always EXACT, the sketch only
    prunes (HyFD-style two-phase)."""
    cols = columns or df.columns
    n = df.count()
    uccs: list[tuple[str, ...]] = []
    candidates = [(c,) for c in cols]
    for _level in range(1, max_size + 1):
        if not candidates:
            break
        cd = distinct_counts(df, candidates, exact)
        if not exact:
            maybe = [s for s in candidates
                     if cd[s] >= n * (1 - _APPROX_TOLERANCE)]
            cd.update(distinct_counts(df, maybe, exact=True))
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
    return uccs


def discover_fds(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
    exact: bool = True,
) -> list[tuple[tuple[str, ...], str]]:
    """All minimal exact FDs ``X -> A`` with ``|X| <= max_lhs``.

    Returns ``[(lhs_tuple, rhs_col), ...]`` sorted. Constant columns yield
    ``() -> A`` (the reference reports these as FDs with empty LHS).
    ``exact=False`` = sketch-prune + exact-confirm two-phase (see
    ``discover_uccs``): results stay exact, the Expand-heavy exact job runs
    only on the sketch survivors."""
    cols = sorted(columns or df.columns)
    n = df.count()
    fds: list[tuple[tuple[str, ...], str]] = []
    found: dict[str, list[tuple[str, ...]]] = {c: [] for c in cols}

    # level 0: constant columns
    cd = distinct_counts(df, [(c,) for c in cols], exact)
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
        cd_cache.update(distinct_counts(df, sorted(need), exact))
        if not exact:
            # two-phase (HyFD-style): the sketch only PRUNES — every
            # candidate equality it can't rule out is re-counted exactly in
            # one batched job, so reported FDs/keys are always exact
            confirm: set[tuple[str, ...]] = set()
            for s in lhs_sets:
                if cd_cache.get(s, 0) >= n * (1 - _APPROX_TOLERANCE):
                    confirm.add(s)
            for s, a, ext in pairs:
                lo, hi = sorted((cd_cache[s], cd_cache[ext]))
                if lo >= hi * (1 - _APPROX_TOLERANCE):
                    confirm.add(s)
                    confirm.add(ext)
            cd_cache.update(distinct_counts(df, sorted(confirm), exact=True))
        for s in lhs_sets:
            if cd_cache.get(s) == n:
                keys.append(s)
        for s, a, ext in pairs:
            if any(set(k) <= set(s) for k in keys):
                continue  # key LHS: trivially determines everything
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
    return sorted(fds)
