"""Faithful Split DD discovery — the reference's full differential-
dependency search, re-expressed Spark-first.

Reference: ``algos::dd::Split`` (/root/reference/src/core/algorithms/dd/
split/split.cpp) discovers a minimal cover of differential dependencies
over a table: per column it builds a candidate difference-constraint
search space (from a user *difference table* of ``[lo;hi]`` intervals, or
a default ``num_dfs_per_column`` grid, split.cpp:337-413), merges the
per-column spaces into an LHS space with feasibility pruning
(split.cpp:415-437 — including the order-dependent inner-loop ``break``),
reduces each RHS candidate with the instance-exclusion strategy
(``InstanceExclusionReduce``, split.cpp:583-629 — the default
``Reduce::IEHybrid``, split.h:37), then removes subsumption-redundant
(split.cpp:165-194) and transitive (split.cpp:196-222, one removal per
pass) dependencies. Distances are metric-type distances: ``|a-b|`` for
numerics, Levenshtein for strings, day deltas for dates
(split.cpp:224-251).

Spark-first design — distinct distance-vector compaction
--------------------------------------------------------
The reference materializes a dense ``columns x rows x rows`` distance
matrix in RAM (split.cpp:288-326) — inherently single-node. The search
itself, however, never needs *pairs*: every decision it takes
(``min_max`` bounds, feasibility, DD verification, instance exclusion) is
a function of the **set of distinct per-column distance vectors** — pairs
with identical distance vectors are interchangeable, and the recursion
only ever tests masks of that set for emptiness. So the one distributed
stage here is:

    self-join (rid_a < rid_b) -> per-column distance expressions
    (JVM ``abs``/``levenshtein``/``datediff``) -> ``distinct()``

and the driver collects only the distinct vectors (budget-guarded) — for
a table with d constrained columns and k distinct values per column that
is at most ``min(pairs, prod_of_pair_distance_counts)`` rows, typically
orders of magnitude below the O(n^2) pair count. The quadratic stage runs
distributed (Catalyst plans a shuffle join; map-side partial
aggregation feeds the distinct), never on the driver. All search logic
below is a rule-for-rule port of the reference control flow so its
goldens (test_split.cpp Test0-Test4, the mining_dd.py flights walkthrough)
replay exactly.

For corpus-scale *verification* of known DDs, use the banded
``operators/dd.py`` path; Split's semantics (global min/max distances and
candidate feasibility over all pairs) are intrinsically all-pairs.
"""

from __future__ import annotations

import re
import sys
from collections.abc import Mapping, Sequence
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["SplitDD", "SplitResult", "discover_dds_split",
           "parse_difference_rows"]

# reference regex (split.cpp:370): non-negative numerics "[a;b]",
# full-match semantics (std::regex_match)
_DF_RE = re.compile(r"\[(\d{1,19}(?:\.\d*)?);(\d{1,19}(?:\.\d*)?)\]")

_INF = float("inf")


@dataclass(frozen=True)
class SplitDD:
    """One mined DD in DDString form (dd.h:55-76): constraints that differ
    from the column's [min,max] envelope, in column order."""

    lhs: tuple[tuple[str, float, float], ...]
    rhs: tuple[str, float, float]

    @property
    def rhs_col(self) -> str:
        return self.rhs[0]

    @property
    def lo(self) -> float:
        return self.rhs[1]

    @property
    def hi(self) -> float:
        return self.rhs[2]

    def __str__(self) -> str:
        # reference DDString::ToString / DFStringConstraint::ToString
        # (dd.h:46-50,59-61): "Col [lo, hi] ; Col [lo, hi] -> Col [lo, hi]"
        left = " ; ".join(f"{c} [{lo:g}, {hi:g}]" for c, lo, hi in self.lhs)
        c, lo, hi = self.rhs
        return f"{left} -> {c} [{lo:g}, {hi:g}]"


@dataclass
class SplitResult:
    dds: list[SplitDD]
    min_max: dict[str, tuple[float, float]]
    num_distinct_vectors: int
    num_pairs: int


def parse_difference_rows(
    header: Sequence[str], rows: Sequence[Sequence[str]]
) -> dict[str, list[tuple[float, float]]]:
    """Parse a reference difference table (cells ``[lo;hi]`` or dashes)
    into per-column candidate interval lists (split.cpp:369-405 accepts
    only full-match ``[num;num]`` strings; everything else is skipped)."""
    out: dict[str, list[tuple[float, float]]] = {c: [] for c in header}
    for row in rows:
        for col, cell in zip(header, row):
            m = _DF_RE.fullmatch(str(cell).strip())
            if m:
                out[col].append((float(m.group(1)), float(m.group(2))))
    return {c: v for c, v in out.items() if v}


def _dist_expr(a, b, dtype: T.DataType):
    """Metric-type distance (split.cpp:224-251): numerics |a-b|, strings
    Levenshtein, dates day deltas — all JVM expressions."""
    if isinstance(dtype, T.StringType):
        return F.levenshtein(a, b).cast("double")
    if isinstance(dtype, T.DateType):
        return F.abs(F.datediff(a, b)).cast("double")
    if isinstance(dtype, T.TimestampType):
        return F.abs(
            a.cast("double") - b.cast("double")
        )
    return F.abs(a.cast("double") - b.cast("double"))


def _distinct_vectors(
    df: DataFrame,
    cols: Sequence[str],
    row_id: str | None,
    budget: int,
) -> tuple[np.ndarray, int]:
    """One distributed stage: all-pairs per-column distances compacted to
    the distinct-vector set. Returns (vectors[m, len(cols)], pair_count)."""
    dtypes = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    if row_id is None:
        rid = "__split_rid"
        # monotonically_increasing_id is nondeterministic across plan
        # branches; pin it before the self-join
        df = df.withColumn(rid, F.monotonically_increasing_id())
        df = df.localCheckpoint(eager=True)
    else:
        rid = row_id

    nulls = df.select(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(f"n_{i}")
          for i, c in enumerate(cols)],
    ).collect()[0]
    n = int(nulls["__n"])
    if n < 2:
        raise ValueError("Split needs at least two rows")
    for i, c in enumerate(cols):
        if int(nulls[f"n_{i}"] or 0):
            # reference CalculateDistance throws on null coordinates
            # (split.cpp:237-242)
            raise ValueError(f"column {c!r} contains nulls")

    a = df.alias("a")
    b = df.alias("b")
    pairs = a.join(b, F.col(f"a.{rid}") < F.col(f"b.{rid}"))
    dists = [
        _dist_expr(F.col(f"a.{c}"), F.col(f"b.{c}"), schema[c]).alias(f"d{i}")
        for i, c in enumerate(cols)
    ]
    rows = pairs.select(*dists).distinct().limit(budget + 1).collect()
    if len(rows) > budget:
        raise ValueError(
            f"distinct distance-vector budget exceeded ({len(rows)} > "
            f"{budget}); raise distinct_budget or constrain fewer columns"
        )
    vec = np.array([[r[f"d{i}"] for i in range(len(cols))] for r in rows],
                   dtype=np.float64)
    _ = dtypes
    return vec, n * (n - 1) // 2


class _Search:
    """Driver-side faithful Split search over the distinct-vector set."""

    def __init__(
        self,
        columns: Sequence[str],
        constrained: Sequence[int],
        vectors: np.ndarray,
        dif: dict[int, list[tuple[float, float]]] | None,
        num_dfs_per_column: int,
    ):
        self.columns = list(columns)
        self.nc = len(columns)
        self.constrained = list(constrained)
        self.pos = {c: p for p, c in enumerate(self.constrained)}
        self.vec = vectors
        self.dif = dif
        self.num_dfs = num_dfs_per_column
        # min_max over all pairs == over distinct vectors
        # (split.cpp:288-326); unconstrained columns keep an infinite
        # envelope their constraints never leave
        self.min_max: list[tuple[float, float]] = []
        for i in range(self.nc):
            if i in self.pos:
                col = vectors[:, self.pos[i]]
                self.min_max.append((float(col.min()), float(col.max())))
            else:
                self.min_max.append((-_INF, _INF))
        self.full = tuple(self.min_max)
        self._mask_cache: dict[tuple, np.ndarray] = {}
        self._true = np.ones(len(vectors), dtype=bool)

    # -- pair-set predicates (CheckDF, split.cpp:254-262) ----------------
    def check(self, dfc: tuple) -> np.ndarray:
        got = self._mask_cache.get(dfc)
        if got is not None:
            return got
        mask = self._true
        for i in self.constrained:
            lo, hi = dfc[i]
            if (lo, hi) != self.min_max[i]:
                col = self.vec[:, self.pos[i]]
                mask = mask & (col >= lo) & (col <= hi)
        self._mask_cache[dfc] = mask
        return mask

    def is_feasible(self, dfc: tuple) -> bool:
        return bool(self.check(dfc).any())

    # -- search spaces (split.cpp:337-437) --------------------------------
    def space_single(self, index: int) -> list[tuple]:
        dfs = [self.full]
        lb, ub = self.min_max[index]
        if self.dif is None:
            # default grid (split.cpp:342-351): [lb, i] for i in
            # num_dfs-1 .. 0 with lb <= i < ub
            for i in range(self.num_dfs - 1, -1, -1):
                if i >= lb and i < ub:
                    d = list(self.full)
                    d[index] = (lb, float(i))
                    dfs.append(tuple(d))
            return dfs
        limits = set()
        for lo, hi in self.dif.get(index, ()):  # parsed [lo;hi] cells
            if hi >= lb and lo <= ub and lo <= hi:
                inter = (max(lo, lb), min(hi, ub))
                if inter != (lb, ub):
                    limits.add(inter)
        # set order (split.cpp:358-365): longer interval first, ties by
        # greater lower bound first
        for lim in sorted(limits, key=lambda p: (-(p[1] - p[0]), -p[0])):
            d = list(self.full)
            d[index] = lim
            dfs.append(tuple(d))
        return dfs

    def space_multi(self, indices: list[int]) -> list[tuple]:
        if len(indices) == 1:
            return self.space_single(indices[0])
        last_space = self.space_single(indices[-1])
        prev_space = self.space_multi(indices[:-1])
        merged = []
        for fdf in prev_space:
            for sdf in last_space:
                inter = tuple(
                    (max(f[0], s[0]), min(f[1], s[1]))
                    for f, s in zip(fdf, sdf)
                )
                if self.is_feasible(inter):
                    merged.append(inter)
                else:
                    break  # reference inner-loop break (split.cpp:432)
        return merged

    # -- pruning helpers (split.cpp:439-523) ------------------------------
    @staticmethod
    def subsume(df1: tuple, df2: tuple) -> bool:
        """df2's intervals all within df1's (split.cpp:439-445)."""
        for (l1, h1), (l2, h2) in zip(df1, df2):
            if l2 < l1 or h2 > h1:
                return False
        return True

    def _neg_prune(self, search, last_df):
        return [d for d in search
                if d != last_df and not self.subsume(d, last_df)]

    def _pos_prune(self, search, first_df):
        return [d for d in search
                if d != first_df and not self.subsume(first_df, d)]

    def _pos_split(self, search, first_df):
        prune, rem = [], []
        for d in search:
            if d != first_df:
                (prune if self.subsume(first_df, d) else rem).append(d)
        return prune, rem

    def _merge(self, base, to_merge):
        """MergeReducedResults (split.cpp:504-523): drop merged DDs whose
        lhs is subsumed by a base DD's lhs."""
        out = []
        for dd in to_merge:
            if not any(self.subsume(b[0], dd[0]) for b in base):
                out.append(dd)
        return out

    # -- InstanceExclusionReduce (split.cpp:583-629) -----------------------
    def ie_reduce(self, pairs: np.ndarray, search: list[tuple],
                  rhs: tuple) -> list[tuple]:
        if not search:
            return []
        first_df = search[0]
        last_df = search[-1]
        rhs_viol = ~self.check(rhs)

        remaining = pairs & self.check(first_df) & rhs_viol
        if not remaining.any():
            dds = [(first_df, rhs)]
            remainder = self._pos_prune(search, first_df)
            dds += self.ie_reduce(pairs, remainder, rhs)
            return dds

        other = pairs & self.check(last_df) & rhs_viol
        if other.any():
            remainder = self._neg_prune(search, last_df)
            return self.ie_reduce(pairs, remainder, rhs)

        prune, remainder = self._pos_split(search, first_df)
        dds = self.ie_reduce(pairs, remainder, rhs)
        pruning_dds = self.ie_reduce(remaining, prune, rhs)
        dds += self._merge(dds, pruning_dds)
        return dds

    # -- top level (split.cpp:116-222) ------------------------------------
    def run(self) -> list[tuple]:
        dd_collection: list[tuple] = []
        for index in range(self.nc):
            if index not in self.pos:
                continue  # unconstrained RHS yields only the full DF
            indices = [j for j in range(self.nc) if j != index]
            if not indices:
                continue
            search = self.space_multi(indices)
            dfs_y = self.space_single(index)
            for df_y in dfs_y:
                if df_y[index] != self.min_max[index]:
                    dd_collection += self.ie_reduce(
                        self._true, search, df_y
                    )

        # RemoveRedundantDDs (split.cpp:165-194)
        while True:
            kept = []
            for li, left in enumerate(dd_collection):
                redundant = False
                for ri, right in enumerate(dd_collection):
                    if li != ri and self.subsume(right[0], left[0]) \
                            and self.subsume(left[1], right[1]):
                        redundant = True
                        break
                if not redundant:
                    kept.append(left)
            if len(kept) == len(dd_collection):
                break
            dd_collection = kept

        # RemoveTransitiveDDs (split.cpp:196-222) — the reference removes
        # at most ONE dd per pass (is_removable is pass-global)
        while True:
            kept = []
            is_removable = False
            for dd3 in dd_collection:
                remove = False
                for dd1 in dd_collection:
                    for dd2 in dd_collection:
                        if self.subsume(dd2[0], dd1[1]) \
                                and dd1[0] == dd3[0] and dd2[1] == dd3[1]:
                            if not is_removable:
                                remove = True
                            is_removable = True
                            break
                    if is_removable:
                        break
                if not remove:
                    kept.append(dd3)
            if len(kept) == len(dd_collection):
                break
            dd_collection = kept
        return dd_collection


def discover_dds_split(
    df: DataFrame,
    *,
    difference_constraints: Mapping[str, Sequence[tuple[float, float]]]
        | None = None,
    num_dfs_per_column: int = 5,
    row_id: str | None = None,
    num_rows: int = 0,
    num_columns: int = 0,
    distinct_budget: int = 2_000_000,
) -> SplitResult:
    """Run the faithful Split DD search.

    ``difference_constraints``: per-column candidate ``(lo, hi)`` interval
    lists (the parsed difference table; see ``parse_difference_rows``).
    ``None`` selects the reference's default grid of ``num_dfs_per_column``
    upper bounds per column (split.cpp:342-351). ``num_rows`` /
    ``num_columns`` mirror the reference's optional limits (first N rows —
    requires ``row_id`` to be a 0-based dense index — / first N columns).
    Columns named by ``row_id`` are excluded from the search.
    """
    columns = [c for c in df.columns if c != row_id]
    if num_columns:
        columns = columns[:num_columns]
    if num_rows and row_id is not None:
        df = df.filter(F.col(row_id) < num_rows)

    if difference_constraints is not None:
        dif_by_name = {c: list(v) for c, v in difference_constraints.items()
                       if c in columns and v}
        needed = [c for c in columns if c in dif_by_name]
    else:
        dif_by_name = None
        needed = list(columns)
    if not needed:
        return SplitResult([], {}, 0, 0)

    vec, num_pairs = _distinct_vectors(
        df.select(*(columns + ([row_id] if row_id else []))),
        needed, row_id, distinct_budget,
    )

    constrained = [columns.index(c) for c in needed]
    dif_by_index = None
    if dif_by_name is not None:
        dif_by_index = {columns.index(c): v for c, v in dif_by_name.items()}

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 20_000))
    try:
        s = _Search(columns, constrained, vec, dif_by_index,
                    num_dfs_per_column)
        raw = s.run()
    finally:
        sys.setrecursionlimit(old_limit)

    dds = []
    for lhs_df, rhs_df in raw:
        # DDToDDString (split.cpp:655-671): constraints differing from the
        # min_max envelope, in column order
        lhs = tuple(
            (columns[i], lhs_df[i][0], lhs_df[i][1])
            for i in range(len(columns)) if lhs_df[i] != s.full[i]
        )
        rhs = [
            (columns[i], rhs_df[i][0], rhs_df[i][1])
            for i in range(len(columns)) if rhs_df[i] != s.full[i]
        ]
        dds.append(SplitDD(lhs, rhs[0]))

    min_max = {c: s.min_max[columns.index(c)] for c in needed}
    return SplitResult(dds, min_max, len(vec), num_pairs)
