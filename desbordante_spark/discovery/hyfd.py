"""Hybrid (HyFD-style) FD discovery — sample-driven negative cover +
batched lattice validation.

Reference: HyFD combines a row-efficient Sampler/Inductor (agree sets from
deterministically sampled row pairs enrich an FD prefix tree) with a
column-efficient Validator (levelwise PLI checks that specialize failed
candidates) (/root/reference/src/core/algorithms/fd/hyfd/hyfd.h:14-37;
Papenbrock & Naumann, SIGMOD'16). TANE-style levelwise search
(discovery/tane.py) evaluates EVERY lattice node; on wide tables the
per-level candidate count explodes. HyFD's insight: most lattice nodes are
refuted by some concrete row pair, and row pairs are cheap — validate only
the candidates that survive a sampled negative cover.

Spark-first mapping:

- **Sampler = ONE batched job.** For every column c, rows sharing a value
  of c are neighbor-paired in row order (HyFD's cluster-sorted sampling:
  pairs that agree somewhere are the informative ones). All columns are
  sampled in a single exploded frame — (column, value) partitions, one
  ``lead()`` window — and each pair reduces to its AGREE SET (the bitmask
  of columns on which the two rows agree, null-safe). Distinct agree sets
  come back ordered by frequency, capped (``max_agree_sets``) so the
  driver collect is bounded at any scale.
- **Inductor = driver-side prefix-tree bookkeeping** (tiny: operates on
  column-index sets, never data). Each sampled agree set A refutes every
  candidate X -> a with X ⊆ A, a ∉ A; refuted candidates are specialized
  by one extra column, keeping the per-rhs candidate sets minimal.
- **Validator = batched ``distinct_counts`` jobs** (the TANE primitive,
  one job per level over only the surviving candidates). A failed
  candidate specializes exactly as in the reference's Validator; a
  confirmed FD prunes its supersets. Keys (|π_X| = n) report their own
  minimal FDs — only their proper supersets are suppressed — matching
  ``discover_fds`` output exactly.

Results are EXACT (every reported FD passed an exact distinct-count
equality); sampling only decides how much of the lattice the validator can
skip. On a 15-column table the full level-2 lattice is ~1.4k candidates;
the sampled negative cover typically leaves a few dozen to validate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from desbordante_spark.discovery.tane import distinct_counts

__all__ = ["discover_fds_hybrid", "sample_agree_sets"]


def sample_agree_sets(
    df: DataFrame,
    columns: list[str],
    max_agree_sets: int = 10_000,
    sample_fraction: float | None = None,
    offset: int = 1,
    content_order: bool = True,
    max_cluster_rows: int = 2_000_000,
    stats: dict | None = None,
) -> list[tuple[frozenset[str], int]]:
    """HyFD Sampler: agree sets of cluster-neighbor row pairs, every column
    in ONE job. Returns ``[(agreeing column set, pair count), ...]`` ordered
    by descending frequency, capped at ``max_agree_sets`` (bounded driver
    collect). ``sample_fraction`` subsamples rows first (a sampled pair is
    still a REAL pair, so refutations stay sound — sampling only shrinks the
    negative cover, leaving more work to the validator). Column agreement is
    tested on null-safe string casts — injective per column for the standard
    types, so a sampled refutation is a true refutation; every surviving
    candidate is re-checked exactly by the validator.

    ``offset`` pairs each row with its ``offset``-th cluster neighbor
    instead of the immediate one — successive offsets are DISJOINT pair
    samples, the growth schedule of the AID-style rounds
    (discovery/aid.py). ``content_order=True`` (the default — layout-
    independent samples make every miner's job count reproducible) sorts
    clusters by a hash of the full row instead of
    ``monotonically_increasing_id`` so the sampled pair set is a pure
    function of the data; it is REQUIRED when the caller's OUTPUT depends
    on the sample, as in AID (the hybrid validator path re-checks
    everything exactly either way).

    ``max_cluster_rows`` bounds the per-window sort partition: a
    low-cardinality column (a constant is the worst case) puts the whole
    table into ONE ``(column, value)`` window partition — a single-task
    sort at scale. Clusters above the bound are detected by one map-side-
    combined aggregate (the heavy-hitter list is ≤ rows×cols/bound —
    bounded driver memory) and salted into ~``max_cluster_rows``-sized
    buckets; neighbor pairs are drawn within buckets, so every sampled
    pair is still a REAL agreeing pair (the sample merely shrinks by the
    bucket-boundary pairs — soundness unaffected). Pass ``stats={}`` to
    receive ``{"salted_clusters": int}``."""
    cols = list(columns)
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=42)
    vals = F.array(*[F.col(c).cast("string") for c in cols])
    rid = (
        F.xxhash64(F.col("v")) if content_order
        else F.monotonically_increasing_id()
    )
    base = df.select(vals.alias("v")).withColumn("_rid", rid)
    # one exploded frame: row i appears once per column, keyed by that
    # column's value — neighbor pairing inside each (column, value) cluster
    structs = [
        F.struct(F.lit(i).alias("c"),
                 F.col("v").getItem(i).alias("val"))
        for i in range(len(cols))
    ]
    e = base.select(
        "_rid", "v", F.explode(F.array(*structs)).alias("k")
    ).select("_rid", "v", "k.c", "k.val")
    # heavy-hitter salting (see docstring): find oversized (c, val)
    # clusters, split each into hash buckets of ~max_cluster_rows rows
    heavy = (
        e.groupBy("c", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > F.lit(int(max_cluster_rows)))
        .collect()
    )
    if stats is not None:
        stats["salted_clusters"] = len(heavy)
    if heavy:
        hdim = df.sparkSession.createDataFrame(
            [(int(r["c"]), r["val"], int(r["cnt"])) for r in heavy],
            "hc int, hval string, hcnt bigint",
        )
        e = e.join(
            F.broadcast(hdim),
            (F.col("c") == F.col("hc"))
            & F.col("val").eqNullSafe(F.col("hval")),
            "left",
        ).drop("hc", "hval")
        e = e.withColumn(
            "_salt",
            F.when(
                F.col("hcnt").isNotNull(),
                F.pmod(
                    F.xxhash64(F.col("_rid")),
                    F.ceil(F.col("hcnt") / F.lit(int(max_cluster_rows))),
                ),
            ).otherwise(F.lit(0)),
        ).drop("hcnt")
    else:
        e = e.withColumn("_salt", F.lit(0))
    w = Window.partitionBy("c", "val", "_salt").orderBy("_rid")
    paired = e.withColumn("nv", F.lead("v", int(offset)).over(w)).filter(
        F.col("nv").isNotNull()
    )
    agree = F.concat_ws(
        "",
        *[
            F.when(
                F.col("v").getItem(i).eqNullSafe(F.col("nv").getItem(i)),
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for i in range(len(cols))
        ],
    )
    top = (
        paired.select(agree.alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("a"))
        .limit(int(max_agree_sets))
        .collect()
    )
    out = []
    for r in top:
        mask = r["a"]
        out.append(
            (frozenset(c for i, c in enumerate(cols) if mask[i] == "1"),
             int(r["cnt"]))
        )
    return out


def _specialize(
    cand: frozenset[str],
    rhs: str,
    avoid: frozenset[str],
    cols: list[str],
    max_lhs: int,
) -> list[frozenset[str]]:
    """Children of a refuted candidate: add one column outside the
    refuting agree set (adding a column inside it cannot break the
    witness pair's agreement)."""
    if len(cand) >= max_lhs:
        return []
    return [
        cand | {b}
        for b in cols
        if b != rhs and b not in cand and b not in avoid
    ]


def _insert_minimal(cands: set[frozenset[str]], new: frozenset[str]) -> None:
    if any(existing <= new for existing in cands):
        return
    for existing in [c for c in cands if new < c]:
        cands.discard(existing)
    cands.add(new)


def discover_fds_hybrid(
    df: DataFrame,
    columns: list[str] | None = None,
    max_lhs: int = 2,
    max_agree_sets: int = 10_000,
    exact: bool = True,
    stats: dict | None = None,
) -> list[tuple[tuple[str, ...], str]]:
    """All minimal exact FDs ``X -> A`` with ``|X| <= max_lhs`` — identical
    output to ``tane.discover_fds``, via the HyFD hybrid strategy.

    ``exact=False`` additionally sketch-prunes the validator's distinct
    counts (same two-phase contract as ``tane.discover_fds``). Pass
    ``stats={}`` to receive ``{"agree_sets", "validated_candidates",
    "full_lattice_candidates"}`` — the concrete lattice-skip evidence."""
    from math import comb

    cols = sorted(columns or df.columns)
    n = df.count()
    n_validated = 0

    # ---- level 0: constant columns (∅ -> a), and key bookkeeping
    cd: dict[tuple[str, ...], int] = dict(
        distinct_counts(df, [(c,) for c in cols], exact=True)
    )
    fds: list[tuple[tuple[str, ...], str]] = []
    constant = {c for c in cols if cd[(c,)] <= 1}
    for c in sorted(constant):
        fds.append(((), c))

    # ---- Sampler + Inductor: negative cover refutes candidates pre-validation
    agree_sets = sample_agree_sets(df, cols, max_agree_sets)
    cands: dict[str, set[frozenset[str]]] = {
        a: {frozenset()} for a in cols if a not in constant
    }
    for aset, _cnt in sorted(agree_sets, key=lambda x: len(x[0])):
        for a in cols:
            if a in aset or a not in cands:
                continue  # pair agrees on a (or a is constant): no refutation
            refuted = [c for c in cands[a] if c <= aset]
            for c in refuted:
                cands[a].discard(c)
                for child in _specialize(c, a, aset, cols, max_lhs):
                    _insert_minimal(cands[a], child)

    # a constant column functionally determines nothing new and is
    # determined by everything; keep reference parity with tane: constants
    # only appear as ∅ -> c, and never in any minimal LHS
    for a in cands:
        cands[a] = {c for c in cands[a] if not (c & constant)}

    # ---- Validator: levelwise batched distinct-count checks
    keys: list[frozenset[str]] = []
    confirmed: dict[str, list[frozenset[str]]] = {a: [] for a in cands}
    for level in range(0, max_lhs + 1):
        todo = [
            (a, c) for a, cs in cands.items() for c in cs if len(c) == level
        ]
        if not todo:
            continue
        if level == 0:
            # ∅ -> a survived the negative cover; valid iff a is constant
            # (already known) — otherwise specialize with every column
            for a, c in todo:
                cands[a].discard(c)
                for b in cols:
                    if b != a and b not in constant:
                        _insert_minimal(cands[a], frozenset({b}))
            continue
        need = set()
        for a, c in todo:
            s = tuple(sorted(c))
            ext = tuple(sorted(c | {a}))
            if s not in cd:
                need.add(s)
            if ext not in cd:
                need.add(ext)
        cd.update(distinct_counts(df, sorted(need), exact, n_rows=n))
        if not exact:
            # exact-confirm pass for every equality the sketch can't rule
            # out (tane two-phase contract)
            from desbordante_spark.discovery.tane import approx_tolerance

            tol = approx_tolerance()
            confirm = set()
            for a, c in todo:
                s = tuple(sorted(c))
                ext = tuple(sorted(c | {a}))
                lo, hi = sorted((cd[s], cd[ext]))
                if lo >= hi * (1 - tol):
                    confirm.add(s)
                    confirm.add(ext)
                if cd[s] >= n * (1 - tol):
                    confirm.add(s)
            cd.update(distinct_counts(df, sorted(confirm), exact=True, n_rows=n))
        for a, c in todo:
            n_validated += 1
            s = tuple(sorted(c))
            ext = tuple(sorted(c | {a}))
            cands[a].discard(c)
            if cd[s] == n and c not in keys:
                keys.append(c)
            if any(k < c for k in keys):
                continue  # PROPER superset of a key: implied, non-minimal
            if any(f < c for f in confirmed[a]):
                continue  # a smaller confirmed FD already determines a
            if cd[s] == cd[ext]:
                confirmed[a].append(c)
                fds.append((s, a))
            else:
                for child in _specialize(c, a, frozenset(), cols, max_lhs):
                    if any(k < child for k in keys):
                        continue
                    if any(f <= child for f in confirmed[a]):
                        continue
                    if child & constant:
                        continue
                    _insert_minimal(cands[a], child)
    if stats is not None:
        m = len(cols)
        stats["agree_sets"] = len(agree_sets)
        stats["validated_candidates"] = n_validated
        stats["full_lattice_candidates"] = sum(
            comb(m - 1, k) * m for k in range(1, max_lhs + 1)
        )
    return sorted(fds)
