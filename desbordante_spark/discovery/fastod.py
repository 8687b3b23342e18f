"""FASTOD set-based OD discovery — canonical asc/desc/simple output.

Reference: Fastod (/root/reference/src/core/algorithms/od/fastod/fastod.h
+ fastod.cpp; Szlichta et al., "Effective and complete discovery of order
dependencies via set-based axiomatization") discovers the complete set of
canonical set-based ODs over the context lattice with two candidate
structures per context X:

- ``CC(X)`` — attributes that may still yield a SIMPLE (constancy) OD
  ``X\\{a}: [] -> a`` (a constant within every ``X\\{a}`` group),
- ``CS_asc/CS_desc(X)`` — attribute pairs that may still yield an
  order-compatibility OD ``X\\{a,b}: a~ -> b`` (sorting each context
  group by a, b is non-decreasing — descending sorts by a desc).

The traversal (fastod.cpp:117-268) is replicated rule-for-rule: CC is
intersected over the parents, a valid simple OD removes its attribute
and restricts CC(X) to X; CS candidates propagate only when present in
every parent, are dropped when the CC cross-conditions fail, and are
removed once their OD validates; contexts with empty CC+CS are pruned
and the next level is the Apriori prefix-join of the survivors.

Spark-first: within a level EVERY validity check is independent of the
others (phase 1's bookkeeping reads only level-1 state; phase 2's
updates touch only the context's own entries), so all simple checks and
all swap checks of a level run as chunked BATCHED jobs — the same
lockstep shape as discovery/dfd.py — while the driver handles only
column-index sets. The swap verdict reuses ``_evaluate_od_candidates``
(discovery/order.py): per context-group, consecutive left-value groups
must satisfy ``max(right | prev) <= min(right | next)`` — exactly the
reference's ``StrippedPartition::Swap`` (stripped_partition.cpp:138-178;
its per-element scan against the previous group's max is equivalent for
the boolean verdict by transitivity of the range ordering).

Ordering caveat: values are compared under an order-preserving numeric
cast (the reference rank-encodes each column under its typed comparator,
storage/data_frame.cpp:125-171 — identical ordering for numeric data).
Non-numeric columns would need the typed-comparator ranking and are out
of scope here.
"""

from __future__ import annotations

import os
from collections import defaultdict
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.discovery.order import _evaluate_od_candidates

__all__ = ["discover_ods_fastod"]

_SEP = "\x01"

#: validity-check batch size — bounds the per-job struct-literal count so
#: plan analysis stays fast even on wide lattices
_CHUNK = 4000

#: above this candidate count, whole-stage codegen is disabled for the
#: check job: Janino fails to compile the thousands-of-branches generate
#: method (method-size limits) and the compile-then-fallback retry costs
#: far more than interpreted evaluation of these driver-bounded batches
_CODEGEN_OFF_ABOVE = 250


class _no_codegen:
    """Temporarily disable whole-stage codegen on the session."""

    def __init__(self, spark, active: bool):
        self.spark = spark
        self.active = active

    def __enter__(self):
        if self.active:
            self.prev = self.spark.conf.get(
                "spark.sql.codegen.wholeStage", "true"
            )
            self.spark.conf.set("spark.sql.codegen.wholeStage", "false")
        return self

    def __exit__(self, *exc):
        if self.active:
            self.spark.conf.set("spark.sql.codegen.wholeStage", self.prev)
        return False


def _constancy_checks(
    df: DataFrame,
    cands: list[tuple[tuple[str, ...], str]],
) -> list[bool]:
    """One batched job per ``_CHUNK``: for (context cols, right col),
    is right CONSTANT within every context group (the reference's
    ``StrippedPartition::Split`` == False)."""
    out: list[bool] = []
    for lo in range(0, len(cands), _CHUNK):
        chunk = cands[lo:lo + _CHUNK]
        structs = []
        for i, (ctx, r) in enumerate(chunk):
            ctxk = (
                F.concat_ws(
                    _SEP, *[F.col(c).cast("string") for c in ctx]
                )
                if ctx
                else F.lit("")
            )
            structs.append(
                F.struct(
                    F.lit(i).alias("cid"),
                    ctxk.alias("ctxk"),
                    F.col(r).cast("string").alias("rv"),
                )
            )
        exploded = df.select(
            F.explode(F.array(*structs)).alias("c")
        ).select("c.cid", "c.ctxk", "c.rv")
        per_group = (
            exploded.groupBy("cid", "ctxk", "rv").agg(F.lit(1).alias("_"))
            .groupBy("cid", "ctxk").agg(F.count(F.lit(1)).alias("nv"))
        )
        with _no_codegen(df.sparkSession, len(chunk) > _CODEGEN_OFF_ABOVE):
            rows = (
                per_group.groupBy("cid")
                .agg(F.max((F.col("nv") > 1).cast("int")).alias("split"))
                .collect()
            )
        split = {int(r["cid"]): int(r["split"]) for r in rows}
        out.extend(split.get(i, 0) == 0 for i in range(len(chunk)))
    return out


def _swap_checks(
    df: DataFrame,
    cands: list[tuple[tuple[str, ...], str, str, str]],
) -> list[bool]:
    """Batched order-compatibility verdicts via the shared evaluator."""
    out: list[bool] = []
    for lo in range(0, len(cands), _CHUNK):
        chunk = cands[lo:lo + _CHUNK]
        with _no_codegen(df.sparkSession, len(chunk) > _CODEGEN_OFF_ABOVE):
            rows = _evaluate_od_candidates(df, chunk, 0).collect()
        verdict = {
            (r["context"], r["lhs"], r["rhs"], r["direction"]): int(r["holds"])
            for r in rows
        }
        for ctx, a, b, d in chunk:
            out.append(verdict[(",".join(ctx), a, b, d)] == 1)
    return out


def discover_ods_fastod(
    df: DataFrame,
    columns: list[str] | None = None,
    stats: dict | None = None,
) -> dict[str, list]:
    """Complete canonical set-based OD discovery, FASTOD traversal.

    Returns ``{"asc": [(context_idx_tuple, left_idx, right_idx), ...],
    "desc": [...], "simple": [(context_idx_tuple, right_idx), ...]}``
    with indices into ``columns`` (order as given — the reference's
    column order). Pass ``stats={}`` for
    ``{"levels", "simple_checks", "swap_checks"}``.
    """
    cols = list(columns or df.columns)
    n = len(cols)
    schema = frozenset(range(n))

    cc: dict[frozenset, frozenset] = {frozenset(): schema}
    cs: dict[str, dict[frozenset, set]] = {
        "asc": defaultdict(set), "desc": defaultdict(set)
    }
    results: dict[str, list] = {"asc": [], "desc": [], "simple": []}
    ctxs: list[frozenset] = [frozenset({i}) for i in range(n)]
    level = 1
    n_simple = 0
    n_swap = 0

    while ctxs:
        # ---- phase 1: CC propagation + CS candidate generation (driver)
        for x in sorted(ctxs, key=sorted):
            parts = [cc[x - {attr}] for attr in x]
            ccx = schema
            for p in parts:
                ccx &= p
            cc[x] = ccx
            if level > 2:
                for d in ("asc", "desc"):
                    for attr in sorted(x):
                        for p in sorted(cs[d][x - {attr}]):
                            a, b = p
                            if a in x and b in x and all(
                                p in cs[d][x - {o}]
                                for o in x - {a, b}
                            ):
                                cs[d][x].add(p)
        if level == 2:
            for x in ctxs:
                i, j = sorted(x)
                for d in ("asc", "desc"):
                    cs[d][x].update({(i, j), (j, i)})

        # ---- phase 2: batched validity checks
        simple_reqs: list[tuple[frozenset, int]] = []
        for x in sorted(ctxs, key=sorted):
            for attr in sorted(x & cc[x]):
                simple_reqs.append((x, attr))
        simple_cands = [
            (tuple(cols[i] for i in sorted(x - {attr})), cols[attr])
            for x, attr in simple_reqs
        ]
        simple_ok = _constancy_checks(df, simple_cands)
        simple_valid = dict(zip(simple_reqs, simple_ok))
        n_simple += len(simple_reqs)

        pair_reqs: list[tuple[frozenset, int, int, str]] = []
        for x in sorted(ctxs, key=sorted):
            for d in ("asc", "desc"):
                for a, b in sorted(cs[d][x]):
                    if a in cc[x - {b}] and b in cc[x - {a}]:
                        pair_reqs.append((x, a, b, d))
        pair_cands = [
            (tuple(cols[i] for i in sorted(x - {a, b})),
             cols[a], cols[b], d)
            for x, a, b, d in pair_reqs
        ]
        pair_ok = _swap_checks(df, pair_cands)
        pair_valid = dict(zip(pair_reqs, pair_ok))
        n_swap += len(pair_reqs)
        if os.environ.get("SPARK_GRAFT_FASTOD_DEBUG"):
            print(
                f"fastod level={level} ctxs={len(ctxs)} "
                f"simple={len(simple_reqs)} swaps={len(pair_reqs)}",
                flush=True,
            )

        # ---- phase 2: apply in the reference's per-context order
        for x in sorted(ctxs, key=sorted):
            for attr in sorted(x & cc[x]):  # iteration set precomputed
                if simple_valid[(x, attr)]:
                    results["simple"].append(
                        (tuple(sorted(x - {attr})), attr)
                    )
                    cc[x] = cc[x] - {attr}
                    if schema - x:
                        cc[x] &= x
            for d in ("asc", "desc"):
                kept = set()
                for p in sorted(cs[d][x]):
                    a, b = p
                    if not (a in cc[x - {b}] and b in cc[x - {a}]):
                        continue  # erased (cross-CC condition failed)
                    if pair_valid[(x, a, b, d)]:
                        results[d].append(
                            (tuple(sorted(x - {a, b})), a, b)
                        )
                    else:
                        kept.add(p)
                cs[d][x] = kept

        # ---- prune + next level (fastod.cpp PruneLevels/CalculateNextLevel)
        if level > 1:
            ctxs = [
                x for x in ctxs
                if cc[x] or cs["asc"][x] or cs["desc"][x]
            ]
        present = set(ctxs)
        nxt = set()
        for x, y in combinations(sorted(ctxs, key=sorted), 2):
            u = x | y
            if len(u) != level + 1:
                continue
            if all((u - {attr}) in present for attr in u):
                nxt.add(u)
        ctxs = sorted(nxt, key=sorted)
        level += 1

    if stats is not None:
        stats["levels"] = level - 1
        stats["simple_checks"] = n_simple
        stats["swap_checks"] = n_swap
    return results
