"""CFD discovery — FDFirst-style itemset-rule mining, Spark-batched.

Reference: FDFirst mines conditional FDs as itemset rules over a prefix-tree
DFS with tidlist partitions (/root/reference/src/core/algorithms/cfd/
fd_first_algorithm.h:13-72; options cfd_minsup / cfd_minconf / cfd_max_lhs,
config/names.h:46-51; exercised by examples/mining_cfd.py). A rule's LHS is
a set of attributes, each bound to a constant or left variable (wildcard
``_``); the RHS is one attribute, constant (only meaningful when the LHS is
fully constant) or variable. Rule quality follows the reference's
most-frequent-RHS semantics (examples/mining_cfd.py::validate_cfd):

- **support**  = number of rows matching every LHS constant,
- **satisfied** = within each group of supported rows agreeing on ALL LHS
  attributes (constants and wildcards), the count of the most frequent RHS
  value, summed over groups,
- **confidence** = satisfied / support.

Spark-first: ALL candidates — every LHS attribute-set up to ``max_lhs``,
every constant/variable binding choice, every RHS attribute — are evaluated
in ONE job. Each row explodes to (candidate, pattern-constants, wildcard
values, rhs value) tuples (the same row-local |candidates|× fan-out TANE and
discover_ods pay — the distributed price of exact lattice evaluation), then
a three-level aggregation (value counts → per-group best → per-pattern
support/satisfied) scores every (candidate × constant pattern)
simultaneously. Map-side combine bounds the shuffle by the number of
DISTINCT patterns, not rows; no per-candidate jobs, no driver-side data.

Divergence from the reference, documented: the reference's free-itemset
pruning suppresses rules implied by more general ones — a post-filter on
the same rule universe, applied here only via thresholds. Constant-RHS
rules report the argmax RHS value; with ``min_confidence > 0.5`` at most
one constant can qualify per pattern, so the argmax set is complete.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.discovery.common import group_key

__all__ = ["discover_cfds"]


def discover_cfds(
    df: DataFrame,
    columns: list[str] | None = None,
    min_support: int = 1,
    min_confidence: float = 0.9,
    max_lhs: int = 2,
    rhs_columns: list[str] | None = None,
    prune_specializations_of_exact: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Mine all qualifying CFD rules with ``|LHS| <= max_lhs``.

    Output (one row per rule): ``(lhs_pattern, rhs_attr, rhs, lhs_size,
    support, satisfied, confidence, is_constant_rhs)`` where ``lhs_pattern``
    is ``"a=v AND b=_"`` (attributes sorted; ``_`` = wildcard), ``rhs`` is
    ``"c=v"`` for constant-RHS rules (fully-constant LHS only) or ``"c=_"``
    for variable rules, and ``confidence = satisfied / support`` under the
    most-frequent-RHS semantics above. Rows with a NULL in any involved
    attribute are excluded from that candidate's counts.

    ``prune_specializations_of_exact=True`` applies the reference FDFirst's
    redundancy rule (verified against test_cfd_algos.cpp goldens): a rule
    is dropped when a strictly more GENERAL rule — same RHS attribute,
    covering items (a variable attribute covers its constants, a variable
    RHS covers a constant one) — holds EXACTLY (confidence 1.0). The more
    general exact rule always qualifies too (≥ support, confidence 1.0 ≥
    any threshold), so pruning is a driver-side pass over the mined rule
    list (small by the minsup bound), never a second data scan.
    """
    cols = sorted(columns or df.columns)
    rhs_cols = sorted(rhs_columns or cols)

    # (lhs_attrs, const_attrs, rhs_attr); fully-constant LHS => constant RHS
    cands: list[tuple[tuple[str, ...], tuple[str, ...], str]] = []
    for k in range(1, max_lhs + 1):
        for s in combinations(cols, k):
            for csize in range(0, k + 1):
                for c in combinations(s, csize):
                    for b in rhs_cols:
                        if b in s:
                            continue
                        cands.append((s, c, b))
    if not cands:
        raise ValueError("no CFD candidates (need >= 2 columns)")

    def _pattern_exprs(s, c):
        cset = set(c)
        pieces = []
        for a in s:  # s is sorted (combinations of sorted cols)
            if a in cset:
                pieces.append(F.concat(F.lit(f"{a}="),
                                       F.col(a).cast("string")))
            else:
                pieces.append(F.lit(f"{a}=_"))
        pattern = F.concat_ws(" AND ", *pieces)
        var_attrs = [a for a in s if a not in cset]
        # injective key (common.group_key): null-bearing rows are filtered
        # upstream, but values containing the separator byte must not
        # collide across attribute boundaries
        var_key = group_key(var_attrs)
        return pattern, var_key

    structs = []
    for cid, (s, c, b) in enumerate(cands):
        pattern, var_key = _pattern_exprs(s, c)
        notnull = F.lit(True)
        for a in (*s, b):
            notnull = notnull & F.col(a).isNotNull()
        structs.append(
            F.when(
                notnull,
                F.struct(
                    F.lit(cid).alias("cid"),
                    pattern.alias("pat"),
                    var_key.alias("vk"),
                    F.col(b).cast("string").alias("rv"),
                ),
            )
        )
    n_cands = len(cands)
    if prune_specializations_of_exact:
        # RHS-INDEPENDENT itemset signatures for the free-itemset test:
        # one extra struct per distinct LHS itemset, null-filtered on the
        # LHS attributes ONLY (a rule row's support excludes RHS-null rows,
        # so per-rule stats would give the first-seen RHS's signature —
        # wrong on NULL-bearing tables). Same exploded frame, no extra scan.
        itemsets = sorted({(s, c) for (s, c, _b) in cands})
        for off, (s, c) in enumerate(itemsets):
            pattern, var_key = _pattern_exprs(s, c)
            notnull = F.lit(True)
            for a in s:
                notnull = notnull & F.col(a).isNotNull()
            structs.append(
                F.when(
                    notnull,
                    F.struct(
                        F.lit(n_cands + off).alias("cid"),
                        pattern.alias("pat"),
                        var_key.alias("vk"),
                        F.lit("").alias("rv"),
                    ),
                )
            )
    exploded = df.select(
        F.explode(
            F.filter(F.array(*structs), lambda x: x.isNotNull())
        ).alias("c")
    ).select("c.cid", "c.pat", "c.vk", "c.rv")

    # value counts -> per-(pattern, wildcard-group) best RHS -> per-pattern
    cnts = exploded.groupBy("cid", "pat", "vk", "rv").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grp = cnts.groupBy("cid", "pat", "vk").agg(
        F.sum("cnt").alias("gs"),
        F.max("cnt").alias("bc"),
        # argmax RHS value, ties -> lexicographically smallest value
        F.min(F.struct((-F.col("cnt")).alias("n"), F.col("rv").alias("v")))
        .getField("v")
        .alias("bv"),
    )
    per_pat = grp.groupBy("cid", "pat").agg(
        F.sum("gs").cast("long").alias("support"),
        F.sum("bc").cast("long").alias("satisfied"),
        F.min("bv").alias("best_rv"),  # single group when LHS fully constant
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    # global (group-ignoring) best RHS mass per pattern — the reference's
    # IsConstRule signal: rhs constant over the pattern rows
    gmax = (
        cnts.groupBy("cid", "pat", "rv").agg(F.sum("cnt").alias("c"))
        .groupBy("cid", "pat").agg(F.max("c").cast("long").alias("g_max"))
    )
    per_pat = per_pat.join(gmax, ["cid", "pat"])

    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(cid, len(s), b, int(len(c) == len(s)))
         for cid, (s, c, b) in enumerate(cands)],
        "cid int, lhs_size int, rhs_attr string, is_constant_rhs int",
    )
    j = per_pat.join(F.broadcast(dim), "cid")
    conf = F.col("satisfied").cast("double") / F.col("support").cast("double")
    rhs = F.when(
        F.col("is_constant_rhs") == 1,
        F.concat(F.col("rhs_attr"), F.lit("="), F.col("best_rv")),
    ).otherwise(F.concat(F.col("rhs_attr"), F.lit("=_")))
    base_cols = [
        F.col("pat").alias("lhs_pattern"),
        "rhs_attr",
        rhs.alias("rhs"),
        "lhs_size",
        "support",
        "satisfied",
        conf.alias("confidence"),
        "is_constant_rhs",
    ]
    if not prune_specializations_of_exact:
        return j.filter(
            (F.col("support") >= F.lit(int(min_support)))
            & (conf >= F.lit(float(min_confidence)))
        ).select(*base_cols)

    # ---- reference FDFirst semantics (fd_first_algorithm.cpp:120-171,
    # verified against the test_cfd_algos.cpp goldens), applied driver-side
    # over min_support-FILTERED per-candidate stats (support is
    # anti-monotone in itemset size, so every sub-itemset signature the
    # free test needs and every exact rule that could prune a kept
    # specialization has support ≥ the kept rule's ≥ min_support — the
    # filter is lossless for the logic below and bounds the driver collect
    # at minsup-qualified patterns instead of all distinct patterns):
    #   (1) variable-RHS rules are skipped when the LHS partition has one
    #       group or the RHS is constant over the pattern rows (those are
    #       const-rule territory — MineFD's sets_number==1 / IsConstRule),
    #   (2) the LHS itemset must be FREE: no proper sub-itemset with the
    #       same (support, n_groups) RHS-INDEPENDENT partition signature
    #       (free_map_),
    #   (3) an EXACT rule whose LHS keeps ≥1 variable attribute prunes
    #       every specialization for the same RHS (rules_[rhs] + Precedes;
    #       all-constant exact rules prune nothing — mushroom golden).
    # ONE collect carries both rule rows (cid < n_cands, dim-joined) and
    # the itemset signature rows (cid >= n_cands, null rhs_attr).
    rows = (
        per_pat.filter(F.col("support") >= F.lit(int(min_support)))
        .join(F.broadcast(dim), "cid", "left")
        .select("cid", *base_cols, "n_groups", "g_max")
        .collect()
    )
    if stats is not None:
        stats["collected_rows"] = len(rows)
    full = [r for r in rows if r["cid"] < n_cands]

    def _items(r):
        d = {}
        for p in r["lhs_pattern"].split(" AND "):
            a, v = p.split("=", 1)
            d[a] = v
        return d

    # itemset partition signatures (rhs-independent, LHS-null-filtered
    # only): (vars, consts) → (support, n_groups)
    sig = {}
    for r in rows:
        if r["cid"] >= n_cands:
            sig[frozenset(_items(r).items())] = (r["support"], r["n_groups"])

    def _free(it):
        key = frozenset(it.items())
        me = sig[key]
        for item in it.items():
            sub = frozenset(k for k in key if k != item)
            if sub and sig.get(sub) == me:
                return False
        return True

    def _precedes(g_it, r_it):
        if not set(g_it) <= set(r_it):
            return False
        for a, gv in g_it.items():
            if gv != "_" and r_it[a] != gv:
                return False
        return g_it != r_it

    min_conf = float(min_confidence)
    exact_var = []  # (items, rhs_attr) of exact rules keeping a variable
    exact_const = []  # (items, rhs_attr) of exact ALL-CONSTANT rules
    rules = []
    for r in full:
        it = _items(r)
        is_exact = r["satisfied"] == r["support"]
        if not r["is_constant_rhs"]:
            if r["n_groups"] == 1 or r["g_max"] == r["support"]:
                continue  # (1) const-rule territory
            if not _free(it):
                continue  # (2)
            rules.append((r, it, is_exact))
            if is_exact and any(v == "_" for v in it.values()):
                exact_var.append((it, r["rhs_attr"]))
        else:
            rules.append((r, it, is_exact))
            if is_exact:
                exact_const.append((it, r["rhs_attr"]))
    kept = []
    for r, it, is_exact in rules:
        if r["support"] < int(min_support) or r["confidence"] < min_conf:
            continue
        if not r["is_constant_rhs"] and any(
            b == r["rhs_attr"] and _precedes(g_it, it)
            for g_it, b in exact_var
        ):
            continue  # (3)
        if r["is_constant_rhs"] and any(
            b == r["rhs_attr"] and _precedes(g_it, it)
            for g_it, b in exact_const
        ):
            continue  # (3') exact constant rules prune constant
            # specializations (mushroom golden: (cap-color=y)=>edible=e
            # absorbs every wider constant pattern)
        kept.append({
            "lhs_pattern": r["lhs_pattern"], "rhs_attr": r["rhs_attr"],
            "rhs": r["rhs"], "lhs_size": r["lhs_size"],
            "support": r["support"], "satisfied": r["satisfied"],
            "confidence": r["confidence"],
            "is_constant_rhs": r["is_constant_rhs"],
        })
    schema = ("lhs_pattern string, rhs_attr string, rhs string, "
              "lhs_size int, support long, satisfied long, "
              "confidence double, is_constant_rhs int")
    return df.sparkSession.createDataFrame(kept, schema)
