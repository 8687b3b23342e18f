"""FastFDs FD discovery — minimal difference-set covers via the
reference's depth-first search.

Reference: /root/reference/src/core/algorithms/fd/fastfds/fastfds.cpp
(309 LoC). Shape of the reference algorithm, reproduced here rule for
rule:

1. agree sets (model/table/agree_set_factory) are complemented into
   DIFFERENCE sets and sorted so subsets precede supersets
   (``GenDiffSets``, fastfds.cpp:268-307);
2. an all-duplicate relation — the only difference set is empty — yields
   no FDs at all (fastfds.cpp:53-57);
3. per RHS attribute: constant columns register ``{} -> A``
   (fastfds.cpp:60-65); otherwise the minimal difference sets MODULO the
   attribute are kept (``GetDiffSetsMod``, fastfds.cpp:235-266 — the
   ascending sort makes the running subset filter complete) and, unless
   that list is just the empty set (no cover can exist), a DFS searches
   their minimal covers (``FindCovers``, fastfds.cpp:107-143):
   branch on the remaining column covering the most remaining difference
   sets, ties broken by DESCENDING column index (``OrderingComp``,
   fastfds.cpp:169-188), recurse only into columns strictly AFTER the
   branch column in the current ordering and still present in some
   remaining difference set (``GetNextOrdering``, fastfds.cpp:206-230),
   and keep a leaf as an FD only if no immediate subset already covers
   (``CoverMinimal``, fastfds.cpp:158-167 — rejected leaves are the
   paper's "wasted effort", counted in ``stats``).

Spark-first split: the quadratic part — the distinct agree sets — comes
from the distributed counting factory (``fdep.compute_agree_sets``:
levelwise subset pair-counts + Möbius inversion, no pair stream, one
batched job per lattice level); the cover search is driver-side over the
tiny distinct-difference-set antichain, exactly where the reference runs
it (its DFS is single-node in-memory too). Pairs agreeing on NO column —
which the factory's nonempty cover omits — are detected by exact pair
accounting (factory counts vs n·(n-1)/2) and contribute the full-column
difference set, like the reference's empty agree set.

Output contract identical to ``tane.discover_fds`` on any relation with
at least two distinct rows: minimal FDs as ``[(lhs_tuple, rhs)]`` sorted,
constants as ``() -> a``, key LHS reported when minimal. (On the
degenerate all-rows-identical relation the reference returns NOTHING —
not even constant FDs — and so does this port; TANE reports the constant
rules there.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from desbordante_spark.discovery.fdep import agree_set_cover

__all__ = ["discover_fds_fastfds"]


def _diff_sets_mod(diff_sets: list[int], bit: int) -> list[int]:
    """GetDiffSetsMod (fastfds.cpp:235-266): difference sets containing
    the attribute, minus the attribute, minimal only. ``diff_sets`` is
    sorted ascending — a subset's mask is always numerically smaller than
    its superset's, so checking only already-kept sets is complete."""
    mod: list[int] = []
    for ds in diff_sets:
        if ds >> bit & 1:
            without = ds & ~(1 << bit)
            if not any(kept & without == kept for kept in mod):
                mod.append(without)
    return mod


def _ordered(cands: list[int], diff_sets: list[int]) -> list[int]:
    """OrderingComp (fastfds.cpp:169-188): coverage count descending,
    ties by descending column index."""
    cov = {c: sum(1 for ds in diff_sets if ds >> c & 1) for c in cands}
    return sorted(cands, key=lambda c: (-cov[c], -c))


def discover_fds_fastfds(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 3,
    max_columns: int = 16,
    wide: str = "pairwise",
    pair_budget: int = 50_000_000,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """All minimal exact FDs ``X -> A`` with ``|X| <= max_lhs`` via the
    FastFDs difference-set cover DFS (``wide='pairwise'`` switches tables
    wider than ``max_columns`` to the budgeted pair-stream agree-set
    factory). Pass ``stats={}`` to receive ``{"diff_sets", "nodes",
    "wasted_effort"}`` — DFS-node and rejected-non-minimal-leaf evidence
    of the search shape."""
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
        agree_masks.add(0)  # some pair agrees on nothing -> full diff set
    full = (1 << m) - 1
    diff_sets = sorted(full ^ a for a in agree_masks)

    nodes = 0
    wasted = 0
    fds: list[tuple[tuple[str, ...], str]] = []

    if diff_sets == [0]:
        # all rows identical: the reference returns before the per-column
        # loop (fastfds.cpp:53-57) — no FDs, not even constants
        if stats is not None:
            stats.update(diff_sets=1, nodes=0, wasted_effort=0)
        return []

    def is_cover(mask: int, sets: list[int]) -> bool:
        return all(mask & ds for ds in sets)

    for a_bit, a in enumerate(cols):
        if n <= 1 or col_pairs[a_bit] == total_pairs:
            fds.append(((), a))  # constant column (fastfds.cpp:60-65)
            continue
        mod = _diff_sets_mod(diff_sets, a_bit)
        if mod == [0]:
            continue  # a pair differs ONLY on a — no FD into a exists

        def rec(path: int, arity: int, cur: list[int], ordering: list[int]):
            nonlocal nodes, wasted
            nodes += 1
            if arity > max_lhs:
                return
            if not ordering and cur:
                return  # no FDs down this path (fastfds.cpp:114-116)
            if not cur:
                # leaf: keep only minimal covers (fastfds.cpp:118-125)
                mm = path
                while mm:
                    b = mm & -mm
                    if is_cover(path ^ b, mod):
                        wasted += 1
                        return
                    mm ^= b
                lhs = tuple(c for c in cols if path >> idx[c] & 1)
                fds.append((lhs, a))
                return
            for pos, c in enumerate(ordering):
                nxt = [ds for ds in cur if not (ds >> c & 1)]
                present = 0
                for ds in nxt:
                    present |= ds
                tail = [d for d in ordering[pos + 1:] if present >> d & 1]
                rec(path | (1 << c), arity + 1, nxt, _ordered(tail, nxt))

        init = _ordered([b for b in range(m) if b != a_bit], mod)
        rec(0, 0, mod, init)

    if stats is not None:
        stats["diff_sets"] = len(diff_sets)
        stats["nodes"] = nodes
        stats["wasted_effort"] = wasted
    return sorted(fds)
