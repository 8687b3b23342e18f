"""Faithful AID-FD — the reference's deterministic sample-don't-validate
FD miner, re-expressed Spark-first.

Reference: ``algos::Aid`` (/root/reference/src/core/algorithms/fd/aidfd/
aid.cpp). Despite the "approximate" label the algorithm has NO randomness:

1. ``BuildClusters`` (aid.cpp:68-91) groups rows per attribute by the
   hash of their cell value, each cluster holding row numbers in ROW
   ORDER; every row remembers its 0-based ``index_in_cluster``.
2. ``CreateNegativeCover`` (aid.cpp:107-129) runs whole-table passes
   ``iteration_num = 1, 2, …``: in each pass every row whose
   ``index_in_cluster >= iteration_num`` (per attribute) is paired with
   the cluster member at the fixed prime stride
   ``(iteration_num * 10619863) % index_in_cluster``
   (``GenerateSecondClusterIndex``, aid.cpp:268-270), and the pair's
   agree set (hash-equality across ALL attributes, aid.cpp:145-155)
   joins the negative-cover set.
3. The pass loop stops by a windowed growth rule
   (``IsNegativeCoverGrowthSmall``, aid.cpp:93-105): a 10-slot ring of
   per-pass growth ratios (seeded with 1.0) whose average dropping below
   0.01 terminates — so dense tables stop after few passes and the
   sample never degenerates to all pairs.
4. ``InvertNegativeCover`` (aid.cpp:205-252) registers ``[] -> c`` for
   constant columns, then per RHS inverts the cover: the positive-cover
   search tree starts from ALL SINGLETONS of the non-constant attributes
   except the RHS (``SearchTree(attributes)``, search_tree.cpp:42-52 —
   NOT the empty set, unlike FDep), and every negative element not
   containing the RHS removes its subsets and re-adds one-attribute
   specializations that keep the tree an antichain
   (``HandleInvalidFd``, aid.cpp:178-203). There is NO validation phase:
   the result is exact w.r.t. the sampled cover only (refutations are
   sound, reported FDs may be too general).

The attribute reordering by negative-cover frequency (aid.cpp:211-226)
only balances the search tree; the resulting cover is order-independent
(the tree is kept an antichain and the final content is the minimal
hitting sets of the processed elements' complements), so this port skips
it and keeps schema order.

Spark-first split
-----------------
Steps 1-2 are the distributed part. One job builds per-attribute cluster
ranks (``row_number() over (partition by attr, value-code order by
row_id) - 1`` after a ``posexplode`` unpivot — the exact
``index_in_cluster``). Pass generation is BLOCKED: iterations
``[lo, hi]`` become one bounded job — ``explode(sequence(lo,
least(idx, hi)))`` (≤ block·n·m rows), an equi-join back on
``(attr, code, partner_index)`` for the partner row id, a double join to
the per-row code arrays and a 62-bit agree mask, then
``groupBy(mask).agg(min(iteration))``. The driver merges blocks and
replays the reference's ring-buffer stop rule on the cumulative distinct
counts — identical pair schedule, identical stop pass, no O(n²) stage
anywhere. Value hashing uses ``xxhash64`` over the injective
length-prefixed encoding (discovery/common.py) — same equality-modulo-
hash-collision contract as the reference's ``std::hash<std::string>``
tuples (aid.cpp:36-40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from desbordante_spark.discovery.common import encode_value

__all__ = ["discover_fds_aid_faithful", "aid_stop_pass"]

K_PRIME = 10619863          # aid.h:34
K_WINDOW_SIZE = 10          # aid.h:33
K_GROWTH_THRESHOLD = 0.01   # aid.h:32


def aid_stop_pass(sizes: list[int]) -> int | None:
    """Replay ``CreateNegativeCover``'s termination (aid.cpp:93-129) over
    cumulative negative-cover sizes (``sizes[k]`` = distinct agree sets
    after pass ``k+1``). Returns the 1-based pass the loop breaks on, or
    None if the rule never fires within ``sizes``."""
    ring = [1.0] * K_WINDOW_SIZE
    total = float(K_WINDOW_SIZE)
    prev = 0
    for k, curr in enumerate(sizes, start=1):
        if prev == 0:
            ratio = 0.0 if curr == 0 else 1.0
        else:
            ratio = curr / prev - 1
        slot = k % K_WINDOW_SIZE
        total -= ring[slot]
        total += ratio
        ring[slot] = ratio
        if total / K_WINDOW_SIZE < K_GROWTH_THRESHOLD:
            return k
        prev = curr
    return None


def _invert_aid(
    neg: list[frozenset[str]],
    cols: list[str],
    constant: frozenset[str],
    rhs: str,
) -> list[frozenset[str]]:
    """``InvertNegativeCover`` for one RHS (aid.cpp:178-252): singleton-
    initialized antichain, subset removal + one-attribute specialization
    per negative element (cardinality-descending order, as the
    reference's ``comp_by_card`` sort)."""
    cands: set[frozenset[str]] = {
        frozenset([a]) for a in cols if a != rhs and a not in constant
    }
    for e in sorted(
        (e for e in neg if rhs not in e),
        key=lambda s: (-len(s), sorted(s)),
    ):
        removed = [c for c in cands if c <= e]
        for c in removed:
            cands.discard(c)
        for c in removed:
            for b in cols:
                if b == rhs or b in e or b in constant:
                    continue
                child = c | {b}
                if not any(x <= child for x in cands):
                    cands.add(child)
    return sorted(cands, key=lambda s: (len(s), sorted(s)))


def discover_fds_aid_faithful(
    df: DataFrame,
    columns: list[str] | None = None,
    row_id: str | None = None,
    block: int = 16,
    max_passes: int | None = None,
    max_masks: int = 2_000_000,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """Faithful AID over ``df``: the reference's exact pair schedule,
    stop rule, and singleton-initialized cover inversion.

    ``row_id`` must be a dense 0-based row-order column (the reference's
    semantics depend on file order); ``None`` pins an arbitrary but
    deterministic order via ``monotonically_increasing_id`` +
    ``localCheckpoint``. ``block`` = passes generated per Spark job.
    ``max_passes`` caps the pass loop (the reference has no cap; the
    windowed rule alone terminates within ``max index_in_cluster + 10``
    passes, which this port reaches by simulating zero-growth passes
    driver-side once every realizable pair has been seen). Returns
    ``[(lhs_tuple, rhs), ...]`` including ``((), c)`` for constant
    columns, in (|lhs|, lhs, rhs) order. Pass ``stats={}`` to receive
    ``{"passes", "neg_cover", "jobs", "constant_columns"}``.
    """
    cols = [c for c in (columns or df.columns) if c != row_id]
    m = len(cols)
    if m == 0:
        raise ValueError("Unable to work on an empty dataset.")
    if m > 62:
        raise ValueError(f"{m} columns exceed the 62-bit agree-set mask")

    if row_id is None:
        rid = "__aid_rid"
        df = df.withColumn(rid, F.monotonically_increasing_id())
        df = df.localCheckpoint(eager=True)
    else:
        rid = row_id

    codes = df.select(
        F.col(rid).cast("long").alias("rid"),
        F.array(*[F.xxhash64(encode_value(c)) for c in cols]).alias("codes"),
    )
    clustered = codes.select(
        "rid", F.posexplode("codes").alias("attr", "key")
    ).withColumn(
        "idx",
        F.row_number().over(
            Window.partitionBy("attr", "key").orderBy("rid")
        ) - F.lit(1),
    )
    codes = codes.persist()
    clustered = clustered.persist()
    jobs = 0
    try:
        # one small agg: per-attribute max cluster rank (constant columns
        # have max idx == n-1; the global max bounds the useful passes)
        head = clustered.groupBy("attr").agg(
            F.max("idx").alias("mx"), F.count(F.lit(1)).alias("n")
        ).collect()
        jobs += 1
        n = int(head[0]["n"]) if head else 0
        by_attr = {int(r["attr"]): int(r["mx"]) for r in head}
        constant = frozenset(
            cols[a] for a, mx in by_attr.items() if n > 0 and mx == n - 1
        )
        max_useful = max(by_attr.values(), default=0)
        hard_cap = max_passes or (max_useful + K_WINDOW_SIZE)

        neg: dict[int, int] = {}   # mask -> first pass it appeared in
        stop: int | None = None
        lo = 1
        while stop is None and lo <= min(max_useful, hard_cap):
            hi = min(lo + block - 1, max_useful, hard_cap)
            part = clustered.filter(F.col("idx") >= F.lit(lo))
            it = part.select(
                "attr", "key", "rid", "idx",
                F.explode(
                    F.sequence(
                        F.lit(lo), F.least(F.col("idx"), F.lit(hi))
                    )
                ).alias("i"),
            ).withColumn(
                "pidx", (F.col("i") * F.lit(K_PRIME)) % F.col("idx")
            )
            partner = clustered.select(
                F.col("attr"), F.col("key"),
                F.col("idx").alias("pidx"), F.col("rid").alias("prid"),
            )
            pairs = it.join(partner, ["attr", "key", "pidx"]).select(
                "i", "rid", "prid"
            )
            scored = (
                pairs.join(codes.select("rid", F.col("codes").alias("ca")),
                           "rid")
                .join(
                    codes.select(
                        F.col("rid").alias("prid"),
                        F.col("codes").alias("cb"),
                    ),
                    "prid",
                )
                .select(
                    "i",
                    F.expr(
                        f"aggregate(transform(sequence(0, {m - 1}), "
                        "j -> IF(ca[j] = cb[j], shiftleft(1L, j), 0L)), "
                        "0L, (acc, x) -> acc + x)"
                    ).alias("mask"),
                )
                .groupBy("mask")
                .agg(F.min("i").alias("first_pass"))
                .collect()
            )
            jobs += 1
            for r in scored:
                mk, fp = int(r["mask"]), int(r["first_pass"])
                if mk not in neg or neg[mk] > fp:
                    neg[mk] = fp
            if len(neg) > max_masks:
                raise ValueError(
                    f"negative-cover budget exceeded ({len(neg)} > "
                    f"{max_masks} distinct agree sets); raise max_masks"
                )
            # the rule needs sizes from pass 1 — recompute the cumulative
            # prefix up to hi (cheap: |neg| is bounded by max_masks)
            sizes = [0] * hi
            for fp in neg.values():
                if fp <= hi:
                    sizes[fp - 1] += 1
            for k in range(1, hi):
                sizes[k] += sizes[k - 1]
            stop = aid_stop_pass(sizes)
            lo = hi + 1
        if stop is None:
            # every realizable pair is in `neg`; later passes add nothing
            # (growth 0), so extend with constant sizes until the window
            # drains — pure driver simulation, no more jobs
            done = min(max_useful, hard_cap)
            sizes = [0] * max(done, 1)
            for fp in neg.values():
                sizes[min(fp, len(sizes)) - 1] += 1
            for k in range(1, len(sizes)):
                sizes[k] += sizes[k - 1]
            tail = sizes + [sizes[-1]] * (hard_cap - len(sizes) + K_WINDOW_SIZE)
            stop = aid_stop_pass(tail) or len(tail)
    finally:
        codes.unpersist()
        clustered.unpersist()

    kept = [mk for mk, fp in neg.items() if fp <= stop]
    neg_sets = [
        frozenset(c for j, c in enumerate(cols) if mk >> j & 1)
        for mk in kept
    ]

    fds: list[tuple[tuple[str, ...], str]] = []
    pos = {c: p for p, c in enumerate(cols)}
    for c in sorted(constant, key=pos.get):
        fds.append(((), c))
    for rhs in cols:
        if rhs in constant:
            continue
        for lhs in _invert_aid(neg_sets, cols, constant, rhs):
            fds.append((tuple(sorted(lhs, key=pos.get)), rhs))
    if stats is not None:
        stats.update(
            passes=stop, neg_cover=len(neg_sets), jobs=jobs,
            constant_columns=sorted(constant, key=pos.get),
        )
    return sorted(
        fds, key=lambda p: (len(p[0]), [pos[c] for c in p[0]], pos[p[1]])
    )
