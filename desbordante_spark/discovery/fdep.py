"""FDep/FastFDs-family FD discovery — exact agree-set factory + negative-
cover inversion.

Reference: the agree-set miners derive ALL minimal FDs from the complete
negative cover — the agree sets over every row pair — instead of validating
lattice candidates: FDep inverts maximal invalid FDs into the positive
cover (/root/reference/src/core/algorithms/fd/fdep/, ~557 LoC), FastFDs
searches minimal hitting sets of the difference sets (complements of agree
sets; fd/fastfds/, ~385 LoC), Depminer works from maximal agree sets
(fd/depminer/). The reference builds the cover by comparing row pairs —
inherently quadratic.

Spark-first agree-set factory — NO pair stream at all. The number of row
pairs agreeing on AT LEAST the column set ``S`` is a pure aggregate:

    P(S) = Σ over π_S clusters of c·(c−1)/2

(one ``groupBy`` per candidate set; a whole lattice level batches into ONE
exploded job, the aucc.py pattern). The number of pairs whose agree set is
EXACTLY ``A`` then follows by Möbius inversion over the lattice:

    N(A) = Σ_{B ⊇ A} (−1)^{|B∖A|} · P(B)

so the complete, EXACT negative cover costs O(n · 2^m) scanned cells and
zero joins, instead of the O(n²) pair comparisons the reference performs —
the quadratic pair mass appears only inside counted arithmetic. Levelwise
Apriori pruning (``P(S) = 0 ⇒ P(S ∪ {c}) = 0`` — a unique column kills
every superset) keeps the evaluated lattice far below 2^m on real tables.
All sums are exact BIGINTs; Python big-int arithmetic does the inversion,
so no overflow at any scale. The 2^m lattice bounds the usable width
(``max_columns``, default 16); for wider tables either the budgeted
pair-stream factory (``compute_agree_sets_pairwise`` — exact, the
reference's within-cluster pair enumeration as DataFrame joins) or the
sampling hybrid (discovery/hyfd.py) is the scale path.

Inversion to FDs (driver-side, data never touched again): for each RHS
``a`` the agree sets NOT containing ``a`` refute every candidate LHS they
contain; specializing refuted candidates by columns OUTSIDE the refuting
set yields exactly the minimal non-refuted sets = minimal valid FDs
(FDep's positive cover; equivalently FastFDs' minimal hitting sets, since
``X ⊄ A`` ⇔ ``X`` hits the difference set ``cols∖A``). Key LHS appear when
minimal — the inversion yields minimal valid sets, so proper superkeys
never do (reference parity) — and constant columns
report only as ``∅ → a`` — the same output contract as
``tane.discover_fds`` / ``hyfd.discover_fds_hybrid``.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.discovery.common import NULL, pair_mass_level

__all__ = [
    "compute_agree_sets",
    "compute_agree_sets_pairwise",
    "discover_fds_fdep",
]


def _pair_counts_level(
    df: DataFrame, cands: list[tuple[str, ...]]
) -> dict[tuple[str, ...], tuple[int, int]]:
    """ONE batched job (discovery/common.py): per candidate column set →
    (unordered pairs agreeing on all its columns, row count). The doubled
    sum arrives as an exact BIGINT and is halved in Python big-int
    arithmetic, so no double rounding can corrupt counts past 2^53."""
    got = pair_mass_level(df, cands)
    return {
        cands[i]: (ep2x // 2, n) for i, (ep2x, n) in got.items()
    }


def compute_agree_sets(
    df: DataFrame,
    columns: list[str] | None = None,
    max_columns: int = 16,
) -> tuple[list[tuple[frozenset[str], int]], int]:
    """Exact complete negative cover: every nonempty agree set realised by
    some row pair, with its EXACT pair count — computed from subset
    pair-counts + Möbius inversion, no pairwise comparison anywhere.

    Returns ``([(agreeing column set, pair count), ...], n_rows)``; pairs
    agreeing on no column are omitted (they refute nothing beyond the
    constant rule). Raises ``ValueError`` past ``max_columns`` — the 2^m
    subset lattice is the budget; use ``hyfd.discover_fds_hybrid`` for
    wider tables."""
    cols = sorted(columns or df.columns)
    m = len(cols)
    if m > max_columns:
        raise ValueError(
            f"{m} columns would need a 2^{m} agree-set lattice"
            f" (max_columns={max_columns}); use discover_fds_hybrid for"
            " wide tables"
        )
    # levelwise P(S) with Apriori pruning: P(S)=0 ⇒ every superset is 0
    p: dict[frozenset[str], int] = {}
    n = 0
    level: list[tuple[str, ...]] = [(c,) for c in cols]
    size = 1
    while level:
        got = _pair_counts_level(df, level)
        for s, (cnt, rows) in got.items():
            p[frozenset(s)] = cnt
            n = max(n, rows)
        alive = {frozenset(s) for s in level if got[s][0] > 0}
        size += 1
        if size > m or not alive:
            break
        nxt = set()
        for s in combinations(cols, size):
            fs = frozenset(s)
            if all(frozenset(sub) in alive
                   for sub in combinations(s, size - 1)):
                nxt.add(s)
        level = sorted(nxt)
    nonzero = [a for a, cnt in p.items() if cnt > 0]
    # Möbius inversion over the (sparse) nonzero-P support: N(A) can only be
    # positive where P(A) > 0, and only nonzero-P supersets contribute
    out: list[tuple[frozenset[str], int]] = []
    for a in nonzero:
        exact = sum(
            (-1 if (len(b) - len(a)) % 2 else 1) * p[b]
            for b in nonzero
            if a <= b
        )
        if exact > 0:
            out.append((a, exact))
    return sorted(out, key=lambda x: (len(x[0]), sorted(x[0]))), n


def compute_agree_sets_pairwise(
    df: DataFrame,
    columns: list[str] | None = None,
    pair_budget: int = 50_000_000,
    stats: dict | None = None,
) -> tuple[list[tuple[frozenset[str], int]], int]:
    """Exact complete agree-set cover for WIDE tables — a distributed
    pair stream instead of the counting factory's 2^m lattice.

    The reference's AgreeSetFactory enumerates row pairs inside PLI
    clusters (model/table/agree_set_factory.cpp — its MC methods build the
    same within-cluster pair set); this is the Spark-first form of that
    path, for tables too wide for the subset-counting factory:

    1. one scan explodes each row into (column, value-hash) cluster keys;
    2. intra-cluster pair mass ``Σ_c Σ_clusters k·(k−1)/2`` is checked
       against ``pair_budget`` with ONE cheap aggregation BEFORE any join
       (every pair agreeing on ≥1 column appears in some single-column
       cluster, so this bounds the join output; past the budget raises
       ValueError — duplicate-heavy wide tables should use
       ``hyfd.discover_fds_hybrid``);
    3. a self-join per cluster key yields candidate pairs, deduplicated;
    4. each distinct pair joins back to its two rows and reduces to an
       agree-set BITMASK in one null-safe string-cast comparison per
       column (same value semantics as the counting factory's keys:
       nulls agree, values compare as strings);
    5. ``groupBy(mask)`` returns every realised agree set with its EXACT
       pair count — the same contract as ``compute_agree_sets`` (pairs
       agreeing on no column are omitted; callers detect them by
       ``Σ counts < n·(n−1)/2``).

    All five steps are DataFrame ops (shuffle joins co-located on cluster
    keys); nothing driver-side until the distinct-mask collect, whose size
    is bounded by the number of realised agree sets.
    """
    cols = sorted(columns or df.columns)
    m = len(cols)
    if m > 62:
        raise ValueError(f"{m} columns exceed the 62-bit agree-set mask")
    idx = {c: i for i, c in enumerate(cols)}
    # pin row ids so the two sides of the self-join see identical values
    base = df.select(
        F.monotonically_increasing_id().alias("_rid"),
        *[F.col(c).cast("string").alias(c) for c in cols],
    ).localCheckpoint()
    n = base.count()
    structs = [
        F.struct(
            F.lit(i).alias("cid"),
            F.xxhash64(F.coalesce(F.col(c), F.lit(NULL))).alias("k"),
        )
        for i, c in enumerate(cols)
    ]
    e = base.select(
        "_rid", F.explode(F.array(*structs)).alias("c")
    ).select("_rid", "c.cid", "c.k")
    mass_row = (
        e.groupBy("cid", "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.sum(F.col("cnt") * (F.col("cnt") - 1)).cast("long"))
        .collect()[0][0]
    )
    mass = int(mass_row or 0) // 2
    if mass > pair_budget:
        raise ValueError(
            f"intra-cluster pair mass {mass} exceeds pair_budget"
            f" {pair_budget}; use discover_fds_hybrid for this table"
        )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.col("a._rid") < F.col("b._rid")),
        )
        .select(
            F.col("a._rid").alias("r1"), F.col("b._rid").alias("r2")
        )
        .distinct()
    )
    lhs = base.select(
        F.col("_rid").alias("r1"),
        *[F.col(c).alias(f"l_{i}") for i, c in enumerate(cols)],
    )
    rhs = base.select(
        F.col("_rid").alias("r2"),
        *[F.col(c).alias(f"r_{i}") for i, c in enumerate(cols)],
    )
    mask = None
    for i in range(m):
        term = F.when(
            F.col(f"l_{i}").eqNullSafe(F.col(f"r_{i}")),
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        mask = term if mask is None else mask + term
    got = (
        pairs.join(lhs, "r1")
        .join(rhs, "r2")
        .select(mask.alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    )
    out = []
    for r in got:
        mk, cnt = int(r["mask"]), int(r["cnt"])
        if mk == 0:
            # an xxhash64 cluster collision between unequal values can
            # surface a candidate pair whose exact agree mask is empty —
            # drop it here so the documented "pairs agreeing on no column
            # are omitted" invariant holds (the covered-pair accounting
            # below already treats such pairs as non-agreeing)
            continue
        out.append(
            (frozenset(c for c in cols if mk >> idx[c] & 1), cnt)
        )
    if stats is not None:
        stats["pair_mass"] = mass
        stats["distinct_agree_sets"] = len(out)
    return sorted(out, key=lambda x: (len(x[0]), sorted(x[0]))), n


def _invert(
    rhs: str,
    cols: list[str],
    bad: list[frozenset[str]],
    max_lhs: int,
) -> list[frozenset[str]]:
    """Minimal candidate sets NOT contained in any refuting agree set
    (FDep positive-cover inversion / FastFDs minimal hitting sets)."""
    cands: set[frozenset[str]] = {frozenset()}
    for aset in sorted(bad, key=lambda s: -len(s)):
        refuted = [c for c in cands if c <= aset]
        if not refuted:
            continue
        for c in refuted:
            cands.discard(c)
            if len(c) >= max_lhs:
                continue
            for b in cols:
                if b == rhs or b in c or b in aset:
                    continue
                child = c | {b}
                if any(x <= child for x in cands):
                    continue
                for x in [x for x in cands if child < x]:
                    cands.discard(x)
                cands.add(child)
    return sorted(cands, key=lambda s: (len(s), sorted(s)))


def agree_set_cover(
    df: DataFrame,
    cols: list[str],
    max_columns: int = 16,
    wide: str = "pairwise",
    pair_budget: int = 50_000_000,
) -> tuple[list[tuple[frozenset[str], int]], int]:
    """Route to the right exact agree-set factory: the subset-counting
    lattice up to ``max_columns`` columns, then (with the default
    ``wide='pairwise'``) the budgeted distributed pair stream;
    ``wide='error'`` opts back into a hard ValueError for wider tables.
    Either way ``pair_budget`` still guards the pairwise path (checked
    against the pair mass BEFORE the join)."""
    if len(cols) > max_columns and wide == "pairwise":
        return compute_agree_sets_pairwise(df, cols, pair_budget=pair_budget)
    return compute_agree_sets(df, cols, max_columns=max_columns)


def discover_fds_fdep(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
    max_columns: int = 16,
    wide: str = "pairwise",
    pair_budget: int = 50_000_000,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """All minimal exact FDs ``X -> A`` with ``|X| <= max_lhs`` from the
    complete agree-set cover — identical output to ``tane.discover_fds``
    and ``hyfd.discover_fds_hybrid``, with ZERO lattice validation jobs:
    the whole answer follows from the counting factory plus driver
    inversion. ``wide='pairwise'`` switches tables wider than
    ``max_columns`` to the budgeted pair-stream factory. Pass
    ``stats={}`` to receive ``{"agree_sets", "pair_mass"}``."""
    cols = sorted(columns or df.columns)
    cover, n = agree_set_cover(
        df, cols, max_columns=max_columns, wide=wide,
        pair_budget=pair_budget,
    )
    agree_sets = [a for a, _cnt in cover]
    # constants: every one of the n·(n−1)/2 pairs agrees on c
    all_pairs = n * (n - 1) // 2
    constant = set()
    for c in cols:
        c_pairs = sum(cnt for a, cnt in cover if c in a)
        if n <= 1 or c_pairs == all_pairs:
            constant.add(c)
    fds: list[tuple[tuple[str, ...], str]] = [
        ((), c) for c in sorted(constant)
    ]

    def is_superkey(x: frozenset[str]) -> bool:
        return not any(x <= a for a in agree_sets)

    for a in cols:
        if a in constant:
            continue
        bad = [s for s in agree_sets if a not in s]
        # only maximal refuting sets matter for containment tests
        bad_max = [s for s in bad if not any(s < t for t in bad)]
        # a is not constant, so SOME pair differs on a; if every such pair
        # has an EMPTY agree set it never enters the cover, yet it still
        # refutes the ∅ candidate — seed the inversion with the empty
        # refuter so ∅ specializes into the singletons (a no-op when bad
        # is nonempty, since ∅ ⊆ every refuting set)
        bad_max.append(frozenset())
        for x in _invert(a, cols, bad_max, max_lhs):
            if not x:
                continue  # ∅ -> a only for constants (handled above)
            if x & constant:
                continue
            fds.append((tuple(sorted(x)), a))
    if stats is not None:
        stats["agree_sets"] = len(agree_sets)
        stats["pair_mass"] = sum(cnt for _a, cnt in cover)
    return sorted(fds)
