"""Depminer FD discovery — CMAX sets + levelwise LHS candidate search.

Reference: /root/reference/src/core/algorithms/fd/depminer/depminer.cpp
(220 LoC) + cmax_set.h. Shape of the reference algorithm, reproduced here
rule for rule:

1. agree sets (model/table/agree_set_factory);
2. per attribute A, the CMAX set: the MAXIMAL agree sets not containing A
   (a running antichain filter, ``GenerateCmaxSets``, depminer.cpp:55-111),
   each complemented (``Invert``) — so every combination contains A;
3. per attribute A (``LhsForColumn``, depminer.cpp:113-152): constant
   columns register ``{} -> A``; otherwise level 1 is the set of single
   columns appearing in any CMAX combination (``GenFirstLevel``,
   depminer.cpp:154-170), and each level candidate ``l`` is an FD iff it
   intersects EVERY CMAX combination (a hitting set of the complements of
   the maximal agree sets missing A); found FDs are registered (unless
   they contain A — candidates may, since the combinations do) and
   REMOVED from the level before apriori generation of the next level
   (``GenNextLevel``, depminer.cpp:173-202: prefix join of equal-size
   sets + all-immediate-subsets-present prune), which is what makes the
   output minimal.

Spark-first split: the quadratic part — the distinct agree sets — comes
from the distributed counting factory (``fdep.compute_agree_sets``:
levelwise subset pair-counts + Möbius inversion, no pair stream); the
CMAX construction and the LHS lattice walk are driver-side over the tiny
distinct-agree-set antichain, exactly where the reference runs them.
Pairs agreeing on NO column contribute the empty agree set (detected by
exact pair accounting), which is maximal for A only when it is the sole
agree set missing A — then its complement (the full column set) puts
every other column in level 1 and each singleton hits it: every column
determines A, as it must when every pair disagreeing on A disagrees
everywhere.

Output contract identical to ``tane.discover_fds``: minimal FDs as
``[(lhs_tuple, rhs)]`` sorted, constants as ``() -> a``, key LHS
reported when minimal. ``max_lhs`` bounds the level walk.
"""

from __future__ import annotations


from pyspark.sql import DataFrame

from desbordante_spark.discovery.fdep import agree_set_cover

__all__ = ["discover_fds_depminer"]


def _maximal(sets: list[int]) -> list[int]:
    """Running antichain filter (depminer.cpp:70-93): keep only sets not
    contained in another; sorting descending by popcount makes one pass
    complete."""
    out: list[int] = []
    for s in sorted(sets, key=lambda x: -bin(x).count("1")):
        if not any(s & kept == s for kept in out):
            out.append(s)
    return out


def discover_fds_depminer(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 3,
    max_columns: int = 16,
    wide: str = "pairwise",
    pair_budget: int = 50_000_000,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """All minimal exact FDs ``X -> A`` with ``|X| <= max_lhs`` via
    Depminer's CMAX hitting-set levelwise search (``wide='pairwise'``
    switches tables wider than ``max_columns`` to the budgeted
    pair-stream agree-set factory). Pass ``stats={}`` to receive
    ``{"agree_sets", "cmax_combinations", "candidates_checked"}``."""
    cols = sorted(columns or df.columns)
    m = len(cols)
    idx = {c: i for i, c in enumerate(cols)}
    cover, n = agree_set_cover(
        df, cols, max_columns=max_columns, wide=wide,
        pair_budget=pair_budget,
    )
    if n == 0:
        # the reference throws at load time on empty input; this engine's
        # convention (tane.discover_fds) is "every column constant"
        return [((), c) for c in cols]
    total_pairs = n * (n - 1) // 2
    agree_masks: set[int] = set()
    covered = 0
    col_pairs = [0] * m
    for aset, cnt in cover:
        mask = 0
        for c in aset:
            mask |= 1 << idx[c]
            col_pairs[idx[c]] += cnt
        agree_masks.add(mask)
        covered += cnt
    if covered < total_pairs:
        agree_masks.add(0)
    full = (1 << m) - 1

    fds: list[tuple[tuple[str, ...], str]] = []
    cmax_total = 0
    checked = 0

    for a_bit, a in enumerate(cols):
        if n <= 1 or col_pairs[a_bit] == total_pairs:
            fds.append(((), a))  # pli->IsConstant() (depminer.cpp:119-124)
            continue
        not_a = [ag for ag in agree_masks if not (ag >> a_bit & 1)]
        cmax = [full ^ s for s in _maximal(not_a)]
        cmax_total += len(cmax)
        # GenFirstLevel: singletons of columns present in any combination
        present = 0
        for comb in cmax:
            present |= comb
        level = {1 << b for b in range(m) if present >> b & 1}
        size = 1
        while level and size <= max_lhs:
            found = set()
            for l in sorted(level):
                checked += 1
                if all(l & comb for comb in cmax):
                    found.add(l)
                    if not (l >> a_bit & 1):
                        lhs = tuple(
                            c for c in cols if l >> idx[c] & 1
                        )
                        fds.append((lhs, a))
            remaining = level - found
            # GenNextLevel (depminer.cpp:173-202): join equal-size sets
            # sharing all but their top bit (the loose CheckJoin + the
            # all-immediate-subsets prune reduce to exactly this), keep
            # unions whose every immediate subset remains — O(|remaining|²)
            # pair work, never a combinations() sweep over the bit union
            size += 1
            if size > max_lhs:
                break
            groups: dict[int, list[int]] = {}
            for l in sorted(remaining):
                top = 1 << (l.bit_length() - 1)
                groups.setdefault(l ^ top, []).append(l)
            nxt = set()
            for sibs in groups.values():
                for ii in range(len(sibs)):
                    for jj in range(ii + 1, len(sibs)):
                        cand = sibs[ii] | sibs[jj]
                        if all(
                            (cand & ~(1 << b)) in remaining
                            for b in range(m) if cand >> b & 1
                        ):
                            nxt.add(cand)
            level = nxt

    if stats is not None:
        stats["agree_sets"] = len(agree_masks)
        stats["cmax_combinations"] = cmax_total
        stats["candidates_checked"] = checked
    return sorted(fds)
