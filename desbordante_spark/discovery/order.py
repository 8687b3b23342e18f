"""Order-dependency discovery (arity-1 list ODs / Fastod-style candidates).

Reference: Order mines list-based ODs over sorted partitions
(/root/reference/src/core/algorithms/od/order/order.h:17-47) and Fastod
mines set-based ODs via stripped partitions + range tables
(od/fastod/fastod.h:20-50). Both reduce every candidate to the same
primitive this module evaluates: within each context group, is there a
"swap" — a pair ordered one way by A and the other way by B?

Spark-first: ALL (A asc/desc → B) candidates are evaluated in ONE job. Each
row explodes to (candidate_id, a_value, b_value) tuples (a row-local array,
the same |candidates|× expansion TANE pays in its Expand — the distributed
price of exact levelwise discovery), then a single
``groupBy(candidate, context, a)`` + one ordered window pass detects swaps
per candidate simultaneously. No per-candidate jobs, no pairwise joins.
Descending candidates negate B (numeric casts), so one ascending check
covers both directions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["discover_ods"]


_SEP = "\x01"
_NULLMARK = "\x00∅"


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
    column-sets at once — still ONE job: the context value joins the
    explode key, so every (context set × pair × direction) candidate shares
    the single aggregation + window pass.
    """
    ctx_sets: list[list[str]] = (
        [list(c) for c in context_candidates]
        if context_candidates is not None
        else [list(context)]
    )
    ctx_union = sorted({c for cs in ctx_sets for c in cs})
    cols = list(columns) if columns else [
        c for c in df.columns if c not in ctx_union
    ]
    cands: list[tuple[int, str, str, str]] = [
        (k, a, b, d)
        for k in range(len(ctx_sets))
        for a in cols for b in cols if a != b
        for d in directions
    ]
    structs = []
    for i, (k, a, b, d) in enumerate(cands):
        # try_cast, not cast: columns default to ALL non-context columns, and
        # under ANSI mode a plain cast on a text column raises
        # CAST_INVALID_INPUT at runtime; non-castable values become NULL and
        # are filtered below (same fix class as drift.py).
        bv = F.col(b).try_cast("double")
        if d == "desc":
            bv = -bv
        ctxk = (
            F.concat_ws(
                _SEP,
                *[F.coalesce(F.col(c).cast("string"), F.lit(_NULLMARK))
                  for c in ctx_sets[k]],
            )
            if ctx_sets[k]
            else F.lit("")
        )
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
        [(i, ",".join(ctx_sets[k]), a, b, d)
         for i, (k, a, b, d) in enumerate(cands)],
        "cid int, context string, lhs string, rhs string, direction string",
    )
    out = F.broadcast(dim).join(per_cand, "cid", "left")
    nsw = F.coalesce(F.col("num_swap_groups"), F.lit(0)).cast("long")
    return out.select(
        "context", "lhs", "rhs", "direction",
        nsw.alias("num_swap_groups"),
        F.coalesce(F.col("total_groups"), F.lit(0)).cast("long")
        .alias("total_groups"),
        (nsw <= F.lit(int(max_swap_groups))).cast("int").alias("holds"),
    )
