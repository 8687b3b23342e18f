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
cast — identical ordering for numeric data. For string/mixed-typed
input, pre-encode with ``fastod_encode.typed_rank_encode``, the faithful
replica of the reference's typed-comparator ranking
(storage/data_frame.cpp:125-171); the string-valued reference goldens
(TestFD, WDC_*) replay bit-for-bit through that path
(tests/test_fastod_golden.py).
"""

from __future__ import annotations

import os
import threading
import time
from collections import defaultdict
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.discovery.common import group_key

from desbordante_spark.discovery.order import _evaluate_od_candidates

__all__ = ["discover_ods_fastod"]


#: hard cap on the validity-check batch size — bounds the per-job
#: struct-literal count so plan analysis stays fast even on wide lattices.
#: The EFFECTIVE chunk is budgeted by pair mass: each check job explodes
#: the frame by the chunk size (chunk structs per row), so
#: ``chunk = pair_mass_budget // n_rows`` keeps one job's pre-aggregation
#: volume at ~``pair_mass_budget`` exploded rows regardless of frame
#: height (the discovery/common.py batching policy) — a fixed 4000-chunk
#: would be a scale-killer at 10^8+ rows (4000 × n_rows structs/job).
_CHUNK_MAX = 4000

#: default exploded-rows-per-job budget; at the golden/profile scales the
#: reference runs (≤ ~10^4 rows) this reproduces the old 4000-chunk
#: behavior exactly, while tall frames shrink the chunk instead of
#: multiplying the job volume
_PAIR_MASS_BUDGET = 40_000_000

#: above this candidate count, whole-stage codegen is disabled for the
#: check job: Janino fails to compile the thousands-of-branches generate
#: method (method-size limits) and the compile-then-fallback retry costs
#: far more than interpreted evaluation of these driver-bounded batches
_CODEGEN_OFF_ABOVE = 250

#: serializes codegen-toggle windows: the conf flip is SESSION-GLOBAL, so
#: two concurrent discovery calls on one session could interleave their
#: save/restore and leave codegen off. The lock makes toggle windows
#: single-flight. (An unrelated concurrent job on the same session during
#: a window still runs interpreted — correct, just slower; documented.)
_CODEGEN_LOCK = threading.Lock()


class _TimeUp(Exception):
    """Internal: the reference's IsTimeUp() fired (fastod.cpp:18-19)."""


class _no_codegen:
    """Temporarily disable whole-stage codegen on the session
    (single-flight via _CODEGEN_LOCK)."""

    def __init__(self, spark, active: bool):
        self.spark = spark
        self.active = active

    def __enter__(self):
        if self.active:
            _CODEGEN_LOCK.acquire()
            self.prev = self.spark.conf.get(
                "spark.sql.codegen.wholeStage", "true"
            )
            self.spark.conf.set("spark.sql.codegen.wholeStage", "false")
        return self

    def __exit__(self, *exc):
        if self.active:
            self.spark.conf.set("spark.sql.codegen.wholeStage", self.prev)
            _CODEGEN_LOCK.release()
        return False


def _check_deadline(deadline: float | None) -> None:
    if deadline is not None and time.monotonic() >= deadline:
        raise _TimeUp


def _constancy_checks(
    df: DataFrame,
    cands: list[tuple[tuple[str, ...], str]],
    chunk_size: int = _CHUNK_MAX,
    deadline: float | None = None,
) -> list[bool]:
    """One batched job per ``chunk_size``: for (context cols, right col),
    is right CONSTANT within every context group (the reference's
    ``StrippedPartition::Split`` == False)."""
    out: list[bool] = []
    for lo in range(0, len(cands), chunk_size):
        _check_deadline(deadline)
        chunk = cands[lo:lo + chunk_size]
        structs = []
        for i, (ctx, r) in enumerate(chunk):
            # injective context key (common.group_key): length-prefixed
            # values with a null marker — no null-skipping collapse, no
            # cross-column or value-equals-sentinel collisions
            ctxk = group_key(ctx)
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
    chunk_size: int = _CHUNK_MAX,
    deadline: float | None = None,
) -> list[bool]:
    """Batched order-compatibility verdicts via the shared evaluator."""
    out: list[bool] = []
    for lo in range(0, len(cands), chunk_size):
        _check_deadline(deadline)
        chunk = cands[lo:lo + chunk_size]
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
    time_limit: float | None = None,
    pair_mass_budget: int = _PAIR_MASS_BUDGET,
) -> dict[str, list]:
    """Complete canonical set-based OD discovery, FASTOD traversal.

    Returns ``{"asc": [(context_idx_tuple, left_idx, right_idx), ...],
    "desc": [...], "simple": [(context_idx_tuple, right_idx), ...]}``
    with indices into ``columns`` (order as given — the reference's
    column order). Pass ``stats={}`` for ``{"levels", "simple_checks",
    "swap_checks", "chunk_size", "n_rows", "complete"}``.

    ``time_limit`` (seconds; None/0 = unlimited) mirrors the reference's
    escape hatch on explosive lattices (fastod.h:31 time_limit_seconds_,
    fastod.cpp:18-19 IsTimeUp): on expiry the traversal stops cleanly at
    the next check boundary and returns the dependencies validated so
    far (``stats["complete"] = False``). ``pair_mass_budget`` bounds one
    check job's exploded-row volume — the batch chunk is
    ``budget // n_rows`` (capped at 4000), so per-job pre-aggregation
    mass stays constant as the frame grows.
    """
    cols = list(columns or df.columns)
    n = len(cols)
    schema = frozenset(range(n))
    n_rows = df.count()
    chunk_size = max(
        1, min(_CHUNK_MAX, pair_mass_budget // max(1, n_rows))
    )
    deadline = (
        time.monotonic() + float(time_limit) if time_limit else None
    )
    complete = True

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
        # reference semantics on expiry: stop cleanly, keep everything
        # already validated (is_complete_ = false, fastod.cpp:138-263).
        # The two phases time out INDEPENDENTLY: constancy verdicts whose
        # jobs completed are applied even when the swap phase expires —
        # their cluster work is already paid.
        try:
            simple_ok = _constancy_checks(
                df, simple_cands, chunk_size, deadline
            )
        except _TimeUp:
            complete = False
            break
        simple_valid = dict(zip(simple_reqs, simple_ok))
        n_simple += len(simple_reqs)
        pair_valid: dict | None
        try:
            pair_ok = _swap_checks(df, pair_cands, chunk_size, deadline)
            pair_valid = dict(zip(pair_reqs, pair_ok))
            n_swap += len(pair_reqs)
        except _TimeUp:
            complete = False
            pair_valid = None  # this level's swap verdicts are unknown
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
            if pair_valid is None:
                continue  # timed out in the swap phase — simple ODs kept
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
        if not complete:
            break

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
        stats["chunk_size"] = chunk_size
        stats["n_rows"] = n_rows
        stats["complete"] = complete
    return results
