"""Order-dependency discovery (arity-1 list ODs / Fastod-style candidates).

Reference: Order mines list-based ODs over sorted partitions
(/root/reference/src/core/algorithms/od/order/order.h:17-47) and Fastod
mines set-based ODs by traversing the context-set lattice with stripped
partitions + range tables (od/fastod/fastod.h:20-50). Both reduce every
candidate to the same primitive this module evaluates: within each context
group, is there a "swap" — a pair ordered one way by A and the other way by
B?

Spark-first: ALL (context, A asc/desc → B) candidates of a batch are
evaluated in ONE job. Each row explodes to (candidate_id, context_key,
a_value, b_value) tuples (a row-local array, the same |candidates|×
expansion TANE pays in its Expand — the distributed price of exact
levelwise discovery), then a single ``groupBy(candidate, context, a)`` +
one ordered window pass detects swaps per candidate simultaneously. No
per-candidate jobs, no pairwise joins. Descending candidates negate B
(numeric casts), so one ascending check covers both directions.

``discover_ods_auto`` adds Fastod's automatic context-lattice traversal:
contexts are enumerated levelwise (∅, singletons, pairs, …) with upward
pruning — an OD that holds under context C holds under every superset of C
(finer groups can only remove swap pairs), so supersets of a holding
context are never evaluated and only MINIMAL contexts are reported. The
driver does lattice bookkeeping only; each level is one batched Spark job.
"""

from __future__ import annotations

from collections.abc import Sequence
from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from desbordante_spark.discovery.common import group_key

__all__ = ["discover_ods", "discover_ods_auto"]



#: candidate = (context column tuple, lhs, rhs, direction)
Candidate = tuple[tuple[str, ...], str, str, str]


def _evaluate_od_candidates(
    df: DataFrame, cands: Sequence[Candidate], max_swap_groups: int
) -> DataFrame:
    """ONE job for a batch of (context, A, B, dir) candidates. Returns
    ``(context, lhs, rhs, direction, num_swap_groups, total_groups,
    holds)`` — one row per candidate."""
    structs = []
    for i, (ctx, a, b, d) in enumerate(cands):
        # try_cast, not cast: columns may default to ALL non-context
        # columns, and under ANSI mode a plain cast on a text column raises
        # CAST_INVALID_INPUT at runtime; non-castable values become NULL
        # and are filtered below (same fix class as drift.py).
        bv = F.col(b).try_cast("double")
        if d == "desc":
            bv = -bv
        # injective context key (common.group_key): length-prefixed values
        # — no cross-column or value-equals-sentinel collisions
        ctxk = group_key(ctx)
        structs.append(
            F.struct(
                F.lit(i).alias("cid"),
                ctxk.alias("ctxk"),
                F.col(a).try_cast("double").alias("av"),
                bv.alias("bv"),
            )
        )
    exploded = (
        df.select(F.explode(F.array(*structs)).alias("c"))
        .select("c.cid", "c.ctxk", "c.av", "c.bv")
        .filter(F.col("av").isNotNull() & F.col("bv").isNotNull())
    )
    g = exploded.groupBy("cid", "ctxk", "av").agg(
        F.min("bv").alias("min_bv"), F.max("bv").alias("max_bv")
    )
    w = (
        Window.partitionBy("cid", "ctxk")
        .orderBy(F.col("av").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("prev_max", F.max("max_bv").over(w))
    swap = (F.col("prev_max") > F.col("min_bv")).cast("long")
    per_cand = g.groupBy("cid").agg(
        F.coalesce(F.sum(swap), F.lit(0)).cast("long").alias("num_swap_groups"),
        F.count(F.lit(1)).cast("long").alias("total_groups"),
    )
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(i, ",".join(ctx), a, b, d)
         for i, (ctx, a, b, d) in enumerate(cands)],
        "cid int, context string, lhs string, rhs string, direction string",
    )
    # broadcast the AGGREGATED side (tiny: one row per candidate) — a hint
    # on the preserved left side of an outer join is unsupported and
    # silently dropped, leaving a shuffle join
    out = dim.join(F.broadcast(per_cand), "cid", "left")
    nsw = F.coalesce(F.col("num_swap_groups"), F.lit(0)).cast("long")
    tg = F.coalesce(F.col("total_groups"), F.lit(0)).cast("long")
    # total_groups = 0 means NO row had castable (av, bv) values — e.g. a
    # text column nulled by try_cast; a vacuous "holds" there would be
    # misleading (and would wrongly prune finer contexts in the auto
    # search), so holding requires at least one real group
    return out.select(
        "context", "lhs", "rhs", "direction",
        nsw.alias("num_swap_groups"),
        tg.alias("total_groups"),
        ((nsw <= F.lit(int(max_swap_groups))) & (tg > 0))
        .cast("int").alias("holds"),
    )


def discover_ods(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    context: Sequence[str] = (),
    directions: Sequence[str] = ("asc", "desc"),
    max_swap_groups: int = 0,
    context_candidates: Sequence[Sequence[str]] | None = None,
) -> DataFrame:
    """All column pairs ``A -> B`` (A ≠ B, numeric-castable) such that
    ordering by A orders B within every context group.

    Output: ``(context, lhs, rhs, direction, num_swap_groups, total_groups,
    holds)`` for every candidate — ``holds`` = 1 iff ``num_swap_groups <=
    max_swap_groups`` (0 = exact OD). ``direction`` is the B ordering
    checked against A ascending (``asc``: A↑ ⇒ B↑; ``desc``: A↑ ⇒ B↓).

    ``context_candidates`` (Fastod's context lattice, restricted to an
    explicit candidate list) checks the same pairs under SEVERAL context
    column-sets at once — still ONE job. For the automatic lattice search
    with minimality pruning, use ``discover_ods_auto``.
    """
    ctx_sets: list[tuple[str, ...]] = (
        [tuple(c) for c in context_candidates]
        if context_candidates is not None
        else [tuple(context)]
    )
    ctx_union = sorted({c for cs in ctx_sets for c in cs})
    cols = list(columns) if columns else [
        c for c in df.columns if c not in ctx_union
    ]
    cands: list[Candidate] = [
        (ctx, a, b, d)
        for ctx in ctx_sets
        for a in cols for b in cols if a != b
        for d in directions
    ]
    return _evaluate_od_candidates(df, cands, max_swap_groups)


def discover_ods_auto(
    df: DataFrame,
    columns: Sequence[str],
    context_attrs: Sequence[str],
    max_context: int = 2,
    directions: Sequence[str] = ("asc", "desc"),
    max_swap_groups: int = 0,
) -> DataFrame:
    """Fastod-style set-OD discovery with automatic context-lattice search
    (od/fastod/fastod.h:20-50): every (A, B, dir) pair is tested under the
    empty context, then under singleton contexts, pairs, … up to
    ``max_context`` attributes drawn from ``context_attrs``.

    Upward pruning: holding under context C implies holding under every
    superset (a swap pair must agree on all context attributes — adding one
    only removes pairs), so once a pair holds its context supersets are
    pruned and only the MINIMAL holding contexts are reported. Candidates
    whose every subset failed are evaluated and reported with their verdict;
    pruned (non-minimal) candidates do not appear.

    Output schema matches ``discover_ods``. One batched job per lattice
    level; the driver only tracks which (pair, direction) combinations
    still need finer contexts.
    """
    cols = list(columns)
    ctx_pool = sorted(context_attrs)
    pairs = [(a, b, d) for a in cols for b in cols if a != b
             for d in directions]
    # candidate verdicts are tiny (one row each): collect each level once
    # and build the result from the collected rows, so returning the frame
    # does NOT re-execute every level's Spark job a second time
    collected: list[tuple] = []
    # per (a,b,d): the set of minimal holding contexts found so far
    held: dict[tuple[str, str, str], list[tuple[str, ...]]] = {
        p: [] for p in pairs
    }
    for level in range(0, max_context + 1):
        cands: list[Candidate] = []
        for ctx in combinations(ctx_pool, level):
            for a, b, d in pairs:
                if a in ctx or b in ctx:
                    continue
                # prune supersets of any holding context (minimality)
                if any(set(h) <= set(ctx) for h in held[(a, b, d)]):
                    continue
                cands.append((ctx, a, b, d))
        if not cands:
            break
        rows = _evaluate_od_candidates(df, cands, max_swap_groups).collect()
        for r in rows:
            collected.append(
                (r["context"], r["lhs"], r["rhs"], r["direction"],
                 int(r["num_swap_groups"]), int(r["total_groups"]),
                 int(r["holds"]))
            )
            if int(r["holds"]) == 1:
                ctx = tuple(r["context"].split(",")) if r["context"] else ()
                held[(r["lhs"], r["rhs"], r["direction"])].append(ctx)
    return df.sparkSession.createDataFrame(
        collected,
        "context string, lhs string, rhs string, direction string, "
        "num_swap_groups long, total_groups long, holds int",
    )
