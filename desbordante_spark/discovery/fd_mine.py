"""FD_Mine FD discovery — levelwise closures with equivalence pruning
and eq-substitution reconstruction.

Reference: /root/reference/src/core/algorithms/fd/fd_mine/fd_mine.cpp
(287 LoC). Shape of the reference algorithm, reproduced here rule for
rule:

1. per level, each candidate ``X`` gets its NON-TRIVIAL CLOSURE: ``y``
   joins ``closure(X)`` iff the partition cardinality is unchanged,
   ``|pi_{X+y}| == |pi_X|`` (``ComputeNonTrivialClosure``,
   fd_mine.cpp:64-101 — ``PositionListIndex::GetNumCluster`` is the FULL
   distinct-group count, position_list_index.h:100-102);
2. ``fd_set_[X] = closure(X)``; ``X`` is a KEY iff ``X + closure(X)``
   covers the relation (``ObtainFDandKey``, fd_mine.cpp:103-108);
3. EQUIVALENCES: candidates ``X, Y`` with ``X−(X∩Y) ⊆ closure(Y)`` and
   ``Y−(X∩Y) ⊆ closure(X)`` are recorded symmetric (``ObtainEqSet``,
   fd_mine.cpp:110-123);
4. PRUNE (fd_mine.cpp:125-147, in the candidate set's ascending bitset
   order): drop a candidate whose equivalence partner is still live, and
   drop keys;
5. next level (``GenerateNextLevelCandidates``, fd_mine.cpp:149-207):
   prefix-join surviving candidates (equal except their top bit), skip a
   pair when one is contained in the other's closure, and route unions
   that are keys BY CLOSURE (``X∪Y ∪ closure(X)∪closure(Y)`` = all
   columns) to the key set instead of the next level;
6. ``Reconstruct`` (fd_mine.cpp:209-267): every discovered ``lhs → rhs``
   is re-expanded over the equivalence classes — substitute eq-partners
   into observed LHS variants breadth-first while saturating the RHS
   with eq-implied columns — and ``Display`` (fd_mine.cpp:269-285)
   emits ``lhs -> j`` for every closure bit ``j`` outside the lhs.

FD_Mine's published output is NOT minimized (its closure RHS keeps
implied columns); the reference's own conformance test
(src/tests/test_fd_mine.cpp:139-186) replaces constant-RHS FDs with the
``{} -> c`` rules and minimizes before comparing with Pyro —
``discover_fds_fdmine_minimized`` applies exactly that post-processing
and must then equal ``tane.discover_fds``.

Spark-first split: the ONLY data-touching primitive is the partition
cardinality, batched per level through the Expand-free
``common.distinct_count_level`` job (one explode + two-level hash
aggregation for every extension count the closure phase needs) — the
reference's per-pair in-memory PLI intersections become one distributed
job per lattice level. All pruning bookkeeping is driver-side bitmask
work, as in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from desbordante_spark.discovery.common import distinct_count_level

__all__ = ["discover_fds_fdmine", "discover_fds_fdmine_minimized"]


def _bits(mask: int) -> list[int]:
    out = []
    b = 0
    while mask:
        if mask & 1:
            out.append(b)
        mask >>= 1
        b += 1
    return out


def discover_fds_fdmine(
    df: DataFrame,
    columns: list[str] | None = None,
    max_columns: int = 24,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """FD_Mine's raw (non-minimized) FD list, as the reference's
    ``FdList()`` returns it: closure-derived ``lhs -> rhs`` rules over the
    eq-reconstructed LHS variants, sorted. There is no ``max_lhs`` —
    the reference algorithm has none; the level walk runs until the
    candidate set empties (equivalence + key pruning bound it). Pass
    ``stats={}`` to receive ``{"levels", "candidates", "eq_pruned",
    "keys", "jobs"}``.

    Column bit positions follow the GIVEN column order (the reference
    uses schema order) — the ascending-bitset prune order and the prefix
    join depend on it, so the raw output is only reference-exact under
    the reference's ordering."""
    cols = list(columns) if columns is not None else list(df.columns)
    m = len(cols)
    if m > max_columns:
        raise ValueError(
            f"{m} columns (max_columns={max_columns}); FD_Mine's "
            "candidate lattice is driver-side and worst-case 2^m — "
            "the equivalence/key pruning bounds it on real tables, but "
            "past this width use discover_fds_hybrid"
        )
    full = (1 << m) - 1
    jobs = 0
    counts: dict[int, int] = {}

    def count_masks(masks: list[int]) -> None:
        nonlocal jobs
        todo = sorted(mk for mk in set(masks) if mk not in counts)
        if not todo:
            return
        cands = [tuple(cols[b] for b in _bits(mk)) for mk in todo]
        got = distinct_count_level(df, cands)
        for i, mk in enumerate(todo):
            counts[mk] = got[i]
        jobs += 1

    cand_set: set[int] = {1 << b for b in range(m)}
    closure: dict[int, int] = {c: 0 for c in cand_set}
    fd_set: dict[int, int] = {}
    eq_set: dict[int, set[int]] = {}
    key_set: set[int] = set()
    levels = 0
    visited = 0
    eq_pruned = 0

    count_masks(sorted(cand_set))

    while cand_set:
        levels += 1
        visited += len(cand_set)
        # ComputeNonTrivialClosure — batch every extension count needed
        need: list[int] = []
        for xi in cand_set:
            for b in range(m):
                if not (xi >> b & 1):
                    need.append(xi | (1 << b))
        count_masks(need)
        for xi in sorted(cand_set):
            cl = closure.get(xi, 0)
            for b in range(m):
                if (full & ~xi & ~cl) >> b & 1:
                    if counts[xi | (1 << b)] == counts[xi]:
                        cl |= 1 << b
            closure[xi] = cl
            # ObtainFDandKey
            fd_set[xi] = cl
            if xi | cl == full:
                key_set.add(xi)
        # ObtainEqSet (fd_mine.cpp:110-123)
        for cand in sorted(cand_set):
            for lhs, lcl in fd_set.items():
                common = cand & lhs
                if (
                    (cand & ~common) & ~lcl == 0
                    and (lhs & ~common) & ~closure[cand] == 0
                    and lhs != cand
                ):
                    eq_set.setdefault(lhs, set()).add(cand)
                    eq_set.setdefault(cand, set()).add(lhs)
        # PruneCandidates (fd_mine.cpp:125-147) — ascending bitset order,
        # eq-partner check against the LIVE set
        live = set(cand_set)
        for xi in sorted(cand_set):
            if any(xj in live for xj in eq_set.get(xi, ())):
                live.discard(xi)
                eq_pruned += 1
                continue
            if xi in key_set:
                live.discard(xi)
        # GenerateNextLevelCandidates (fd_mine.cpp:149-207): prefix join —
        # pairs equal except their top set bit
        groups: dict[int, list[int]] = {}
        for c in sorted(live):
            top = 1 << (c.bit_length() - 1)
            groups.setdefault(c ^ top, []).append(c)
        nxt: set[int] = set()
        for sibs in groups.values():
            for i in range(len(sibs)):
                for j in range(i + 1, len(sibs)):
                    ci, cj = sibs[i], sibs[j]
                    if (cj & ~fd_set[ci]) == 0 or (ci & ~fd_set[cj]) == 0:
                        continue
                    cij = ci | cj
                    cl_ij = closure[ci] | closure[cj]
                    if cij | cl_ij == full:
                        key_set.add(cij)
                    else:
                        nxt.add(cij)
        # the union mask was counted this round iff it was a closure
        # extension of a parent; count any stragglers lazily next round
        cand_set = nxt

    # Reconstruct (fd_mine.cpp:209-267)
    final: dict[int, int] = {}
    for lhs, rhs in fd_set.items():
        observed: dict[int, bool] = {lhs: True}
        rhs_copy = rhs
        queue = [lhs]
        for eq, eqs in eq_set.items():
            if eq & ~rhs_copy == 0:
                for er in eqs:
                    rhs_copy |= er
        rhs_stable = False
        while queue:
            cur = queue.pop(0)
            before = rhs_copy
            for eq, eqs in eq_set.items():
                if not rhs_stable and eq & ~rhs_copy == 0:
                    for er in eqs:
                        rhs_copy |= er
                if eq & ~cur == 0:
                    tmp = cur & ~eq
                    for new_eq in eqs:
                        gen = tmp | new_eq
                        if not observed.get(gen):
                            queue.append(gen)
                            observed[gen] = True
            if rhs_copy == before:
                rhs_stable = True
        for l in observed:
            final[l] = final.get(l, 0) | rhs_copy

    # Display (fd_mine.cpp:269-285)
    fds: list[tuple[tuple[str, ...], str]] = []
    for lhs, rhs in final.items():
        lhs_cols = tuple(cols[b] for b in _bits(lhs))
        for b in _bits(rhs & ~lhs):
            fds.append((lhs_cols, cols[b]))
    if stats is not None:
        stats.update(
            levels=levels, candidates=visited, eq_pruned=eq_pruned,
            keys=len(key_set), jobs=jobs,
        )
    return sorted(set(fds))


def discover_fds_fdmine_minimized(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int | None = None,
    max_columns: int = 24,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """FD_Mine post-processed exactly as the reference's own conformance
    test does before comparing with Pyro
    (src/tests/test_fd_mine.cpp:139-186): every FD whose RHS is a
    constant column is replaced by the ``{} -> c`` rule, then the list is
    minimized per RHS (drop any FD whose LHS contains another's LHS).
    The result equals ``tane.discover_fds`` (optionally filtered to
    ``|lhs| <= max_lhs`` for comparability with a bounded miner)."""
    cols = list(columns) if columns is not None else list(df.columns)
    raw = discover_fds_fdmine(
        df, columns=cols, max_columns=max_columns, stats=stats
    )
    const_counts = distinct_count_level(df, [(c,) for c in cols])
    constants = {c for i, c in enumerate(cols) if const_counts[i] <= 1}
    out = {(lhs, rhs) for lhs, rhs in raw if rhs not in constants}
    out |= {((), c) for c in sorted(constants)}
    minimal = set()
    for lhs, rhs in out:
        if any(
            r2 == rhs and set(l2) < set(lhs) for l2, r2 in out
        ):
            continue
        minimal.add((lhs, rhs))
    if max_lhs is not None:
        minimal = {fd for fd in minimal if len(fd[0]) <= max_lhs}
    return sorted(minimal)
