"""n-ary IND discovery — Mind-style levelwise search over Spider's unary INDs.

Reference: Mind generates arity-k candidates from valid arity-(k-1) INDs
(Apriori downward closure — every projection of a valid n-ary IND is a valid
IND) and validates each against the data
(/root/reference/src/core/algorithms/ind/mind/mind.h:17-20, mind.cpp).

Spark-first: the driver loop only does candidate bookkeeping (tiny — pairs
of table/column lists). Validation of ALL candidates of a level happens in
ONE Spark job: each candidate contributes its LHS and RHS *distinct value
tuples* (arrays of strings, nulls excluded) tagged with the candidate id and
side; a single groupBy(candidate, value) then counts, per candidate, how
many LHS tuples are missing from the RHS — the same union + double-agg shape
as the Spider port (discovery/spider.py), generalized from scalar values to
tuples. No per-candidate jobs, no pairwise loops; the shuffle co-locates
equal tuples.

Candidate generation (mind.cpp semantics): an arity-k candidate pairs k
aligned unary INDs (same table pair, all-distinct LHS columns, all-distinct
RHS columns), canonicalized by sorting on the LHS column list; it survives
only if every (k-1)-ary projection was valid at the previous level.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["discover_nary_inds"]


def _fmt(table: str, cols: tuple[str, ...]) -> str:
    return f"{table}[{','.join(cols)}]"


def _level_validate(
    tables: dict[str, DataFrame],
    candidates: list[tuple[str, tuple[str, ...], str, tuple[str, ...]]],
    cast_to: str,
) -> dict[int, tuple[int, int]]:
    """One job for the whole level: per candidate id →
    ``(lhs_distinct, missing)`` where missing = # distinct LHS tuples absent
    from the RHS side."""
    parts = []
    for cid, (lt, lcols, rt, rcols) in enumerate(candidates):
        for side, t, cols in (("L", lt, lcols), ("R", rt, rcols)):
            v = F.array(*[F.col(c).cast(cast_to) for c in cols])
            proj = (
                tables[t]
                .select(v.alias("v"))
                .filter(~F.exists(F.col("v"), lambda x: x.isNull()))
                .distinct()
                .select(
                    F.lit(cid).alias("cid"),
                    F.col("v"),
                    F.lit(side == "L").alias("is_l"),
                )
            )
            parts.append(proj)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = (
        u.groupBy("cid", "v")
        .agg(
            F.max(F.col("is_l").cast("int")).alias("has_l"),
            F.max((~F.col("is_l")).cast("int")).alias("has_r"),
        )
        .groupBy("cid")
        .agg(
            F.sum("has_l").alias("lhs_distinct"),
            F.sum(
                (F.col("has_l") * (1 - F.col("has_r")))
            ).alias("missing"),
        )
        .collect()
    )
    return {int(r["cid"]): (int(r["lhs_distinct"]), int(r["missing"]))
            for r in agg}


def _level_validate_sketch(
    tables: dict[str, DataFrame],
    candidates: list[tuple[str, tuple[str, ...], str, tuple[str, ...]]],
    cast_to: str,
    rsd: float,
) -> dict[int, tuple[int, int, int]]:
    """Faida-style HLL prune for a whole level in ONE job: per candidate id
    → ``(lhs_approx, rhs_approx, union_approx)``.

    Reference: Faida tests IND candidates with HyperLogLog sketches —
    ``R[X] ⊆ S[Y]`` approximately iff ``|distinct(Y ∪ X)| ≈ |distinct(Y)|``
    (/root/reference/src/core/algorithms/ind/faida/faida.h:20-24). Spark's
    ``approx_count_distinct`` IS HLL++; each candidate contributes its LHS
    tuples tagged (cid, 'L') and its RHS tuples tagged (cid, 'R'); one
    grouped conditional-sketch aggregate scores every candidate (the union
    sketch is simply the unconditional one over both sides) — no exact
    distinct shuffle anywhere."""
    # scan each DISTINCT (table, column-tuple) projection ONCE and fan its
    # rows out to every (candidate, side) that references it via a literal
    # explode — a per-candidate union would rescan the source tables
    # (candidates × 2) times, making the prune dearer than the exact pass
    # it is meant to avoid
    proj_users: dict[tuple[str, tuple[str, ...]],
                     list[tuple[int, str]]] = {}
    for cid, (lt, lcols, rt, rcols) in enumerate(candidates):
        proj_users.setdefault((lt, lcols), []).append((cid, "L"))
        proj_users.setdefault((rt, rcols), []).append((cid, "R"))
    parts = []
    for (t, cols), users in sorted(proj_users.items()):
        v = F.array(*[F.col(c).cast(cast_to) for c in cols])
        tags = F.array(*[
            F.struct(F.lit(cid).alias("cid"), F.lit(side).alias("w"))
            for cid, side in users
        ])
        parts.append(
            tables[t]
            .select(v.alias("v"))
            .filter(~F.exists(F.col("v"), lambda x: x.isNull()))
            .select(F.explode(tags).alias("u"), F.col("v"))
            .select(F.col("u.cid").alias("cid"),
                    F.col("u.w").alias("w"), F.col("v"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = (
        u.groupBy("cid")
        .agg(
            F.approx_count_distinct(
                F.when(F.col("w") == "L", F.col("v")), rsd
            ).alias("l"),
            F.approx_count_distinct(
                F.when(F.col("w") == "R", F.col("v")), rsd
            ).alias("r"),
            F.approx_count_distinct(F.col("v"), rsd).alias("u"),
        )
        .collect()
    )
    return {int(x["cid"]): (int(x["l"]), int(x["r"]), int(x["u"]))
            for x in agg}


def discover_nary_inds(
    tables: dict[str, DataFrame],
    columns: dict[str, list[str]] | None = None,
    max_arity: int = 2,
    max_error: float = 0.0,
    cast_to: str = "string",
    approx: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """All valid INDs up to ``max_arity`` among the given tables/columns.

    Output: ``(lhs, rhs, arity, lhs_distinct, missing, error, holds)`` with
    ``lhs``/``rhs`` as ``table[c1,c2,...]`` strings, error = missing distinct
    LHS-tuple fraction (Spider's AIND measure generalized to tuples).
    ``max_error > 0`` accepts AINDs but levelwise pruning then assumes
    projections of accepted INDs were themselves accepted (exact for
    ``max_error=0``, the Mind setting).

    ``approx=True`` is the Faida scale path (faida.h:20-24): each level's
    candidates are first scored with HLL++ containment sketches
    (``_level_validate_sketch`` — one job, no exact distinct shuffle), and
    only the candidates the sketch can't rule out go to the exact
    tuple-containment job. Every REPORTED IND passed the exact check; the
    (documented) probabilistic risk is pruning — a true IND is dropped only
    if the union/rhs sketches jointly err beyond ``4·rsd`` (≲ 1e-4 per
    candidate at the default rsd=0.02).
    """
    spark = next(iter(tables.values())).sparkSession
    cols_of = {
        t: list((columns or {}).get(t, df.columns) if columns else df.columns)
        for t, df in tables.items()
    }
    results: list[tuple[str, str, int, int, int, float, int]] = []

    # level 1: every unary pair, INCLUDING same-table column pairs (the
    # reference Mind consumes Spider's unary INDs, which include intra-table
    # pairs); only the identical projection (lt==rt and lc==rc) is skipped.
    unary_cands = [
        (lt, (lc,), rt, (rc,))
        for lt in tables for rt in tables
        for lc in cols_of[lt] for rc in cols_of[rt]
        if not (lt == rt and lc == rc)
    ]
    valid: set[tuple[str, str, tuple[tuple[str, str], ...]]] = set()
    cands = unary_cands
    for arity in range(1, max_arity + 1):
        if not cands:
            break
        if approx:
            sk = _level_validate_sketch(tables, cands, cast_to, rsd)
            survivors = []
            for cid, cand in enumerate(cands):
                l_a, r_a, u_a = sk.get(cid, (0, 0, 0))
                slack = 4.0 * rsd * u_a + max_error * l_a
                if u_a - r_a <= slack:
                    survivors.append(cand)
            cands = survivors
            if not cands:
                break
        stats = _level_validate(tables, cands, cast_to)
        new_valid = set()
        for cid, (lt, lcols, rt, rcols) in enumerate(cands):
            nd, miss = stats.get(cid, (0, 0))
            err = miss / nd if nd else 0.0
            if nd and err <= max_error:
                pairs = tuple(sorted(zip(lcols, rcols)))
                new_valid.add((lt, rt, pairs))
                results.append(
                    (_fmt(lt, lcols), _fmt(rt, rcols), arity, nd, miss,
                     err, 1)
                )
        valid = new_valid
        if arity == max_arity:
            break
        # arity+1 candidates: combine aligned unary pairs per table pair,
        # prune by downward closure on the just-validated level
        by_tables: dict[tuple[str, str], list[tuple[tuple[str, str], ...]]] = {}
        for lt, rt, pairs in valid:
            by_tables.setdefault((lt, rt), []).append(pairs)
        # pool of aligned (lhs_col, rhs_col) pairs per table pair —
        # projections of any valid IND are themselves valid INDs
        unary_pool: dict[tuple[str, str], set[tuple[str, str]]] = {}
        for lt, rt, pairs in valid:
            unary_pool.setdefault((lt, rt), set()).update(pairs)
        prev = {(lt, rt): set(map(frozenset, plist))
                for (lt, rt), plist in by_tables.items()}
        nxt = []
        for (lt, rt), pool in unary_pool.items():
            for combo in combinations(sorted(pool), arity + 1):
                lcols = tuple(p[0] for p in combo)
                rcols = tuple(p[1] for p in combo)
                if len(set(lcols)) < len(lcols) or len(set(rcols)) < len(rcols):
                    continue
                # de Marchi GenNext: a same-table candidate whose side
                # column SETS intersect is never generated (mind.cpp:
                # 126-128 + column_combination.cpp:20-29 — Faida's
                # apriori_candidate_generator.cpp:28 applies the same
                # rule); this also covers the identical projection
                if lt == rt and set(lcols) & set(rcols):
                    continue
                # downward closure: every arity-k projection must be valid
                if any(
                    frozenset(sub) not in prev.get((lt, rt), set())
                    for sub in combinations(combo, arity)
                ):
                    continue
                nxt.append((lt, lcols, rt, rcols))
        cands = nxt

    return spark.createDataFrame(
        sorted(results),
        "lhs string, rhs string, arity int, lhs_distinct bigint, "
        "missing bigint, error double, holds int",
    )
