"""Round-4 fixes: ADVICE findings (compat Apriori tabular path, Spider
basename collision, CFD free-itemset NULL signature + bounded prune-path
collect, quantile_drift zero-span/missing-baseline) and VERDICT items
(HyFD sampler heavy-cluster salting, drift cache guard removal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ compat fixes

def test_compat_apriori_tabular(spark, tmp_path):
    """ADVICE compat.py:516 — tabular input through the facade used to
    reference the dropped _rid column and raise UNRESOLVED_COLUMN."""
    import pandas as pd

    import desbordante_spark.compat as desbordante

    pdf = pd.DataFrame(
        {
            "i1": ["bread", "bread", "milk", "bread"],
            "i2": ["milk", "milk", "eggs", "milk"],
            "i3": [None, "eggs", None, None],
        }
    )
    algo = desbordante.ar.algorithms.Apriori()
    algo.load_data(table=pdf)
    algo.execute(minsup=0.5, minconf=0.9, input_format="tabular")
    got = {(tuple(r.left), tuple(r.right)) for r in algo.get_ars()}
    # milk appears in every transaction: bread -> milk and eggs -> milk
    # both hold at confidence 1.0
    assert (("bread",), ("milk",)) in got
    assert (("eggs",), ("milk",)) in got


def test_compat_spider_basename_collision(spark, tmp_path):
    """ADVICE compat.py:309 — a/data.csv and b/data.csv must both load."""
    import desbordante_spark.compat as desbordante

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    (a / "data.csv").write_text("x\n1\n2\n")
    (b / "data.csv").write_text("y\n1\n2\n3\n")
    algo = desbordante.ind.algorithms.Spider()
    algo.load_data(tables=[(str(a / "data.csv"), ",", True),
                           (str(b / "data.csv"), ",", True)])
    assert len(algo._tables) == 2
    algo.execute()
    # x ⊆ y holds across the two tables — impossible if one was dropped
    pairs = {(r["lhs"], r["rhs"]) for r in algo.get_inds()}
    tables = {s.split(".")[0] for p in pairs for s in p}
    assert len(tables) == 2


# ------------------------------------------------------------- drift fixes

def test_drift_cache_failure_surfaces(spark):
    """VERDICT item 7 — a failing sketch evaluation must raise at
    drift_metrics() time, not silently degrade to lazy re-scans."""
    from desbordante_spark.operators.drift import drift_metrics

    bad = spark.createDataFrame(
        [("p", "b", "notanumber")],
        "partition string, bucket string, c string",
    ).select(
        "partition", "bucket", F.col("c").cast("long").alias("cnt")
    )
    with pytest.raises(Exception):
        drift_metrics(bad)  # ANSI cast failure surfaces in the eager cache


def test_quantile_drift_zero_span_detects_displacement(spark):
    """ADVICE drift.py:249 — constant baseline: displacement must flag
    drift instead of dividing into a silent max_q_shift=0."""
    from desbordante_spark.operators.drift import quantile_drift

    rows = (
        [("base", 5.0)] * 30 + [("shifted", 7.0)] * 30 + [("same", 5.0)] * 30
    )
    df = spark.createDataFrame(rows, "p string, v double")
    out = {
        r["partition"]: r
        for r in quantile_drift(
            df, "v", "p", baseline_partition="base"
        ).collect()
    }
    assert out["shifted"]["drifted"] is True
    assert out["shifted"]["max_q_shift"] == float("inf")
    assert out["same"]["drifted"] is False
    assert out["same"]["max_q_shift"] == 0.0


def test_quantile_drift_missing_baseline_raises(spark):
    from desbordante_spark.operators.drift import quantile_drift

    df = spark.createDataFrame([("a", 1.0)], "p string, v double")
    with pytest.raises(ValueError, match="matches no rows"):
        quantile_drift(df, "v", "p", baseline_partition="nope")


# --------------------------------------------------------- CFD miner fixes

def test_cfd_free_signature_rhs_independent(spark):
    """ADVICE cfd_miner.py:209 — the free-itemset signature must be
    computed over rows non-null in the LHS attributes ONLY. Here B
    distinguishes rows only where R is NULL: under the old per-RHS
    signature {A,B} and {A} could look identical (both computed over the
    R-non-null rows) and the valid rule (A=_ AND B=_) -> R=_ was dropped
    nondeterministically; RHS-independent signatures keep it."""
    from desbordante_spark.discovery.cfd_miner import discover_cfds

    rows = [
        ("a1", "b1", "x"),
        ("a1", "b1", "y"),
        ("a2", "b1", "x"),
        ("a2", "b1", "x"),
        ("a1", "b2", None),
    ]
    df = spark.createDataFrame(rows, "A string, B string, R string")
    got = {
        (r["lhs_pattern"], r["rhs"])
        for r in discover_cfds(
            df, min_support=1, min_confidence=0.5, max_lhs=2,
            prune_specializations_of_exact=True,
        ).collect()
    }
    # sig({A=_,B=_}) = (5,3) differs from sig({A=_}) = sig({B=_}) = (5,2)
    # over the LHS-non-null rows, so the itemset is free and the rule
    # (conf 3/4 over the 4 R-non-null rows) must be kept
    assert ("A=_ AND B=_", "R=_") in got
    # (B=_) -> R has a single group over the R-non-null rows: const-rule
    # territory, never emitted as a variable rule
    assert ("B=_", "R=_") not in got


def test_cfd_prune_collect_bounded(spark):
    """ADVICE/VERDICT cfd_miner.py:194 — the prune-path driver collect is
    filtered by min_support BEFORE collecting: a high-cardinality column
    must not inflate it to O(distinct values)."""
    from desbordante_spark.discovery.cfd_miner import discover_cfds

    df = spark.range(500).select(
        F.lit("a").alias("A"),
        F.concat(F.lit("c"), F.col("id")).alias("C"),
    )
    stats: dict = {}
    discover_cfds(
        df, min_support=100, min_confidence=0.9, max_lhs=1,
        prune_specializations_of_exact=True, stats=stats,
    ).collect()
    # unfiltered: 500 (C=c_i) patterns per RHS plus 500 itemset signatures;
    # filtered: only the support-500 patterns survive
    assert stats["collected_rows"] < 20


def test_cfd_prune_goldens_unchanged_on_null_free(spark):
    """The RHS-independent signature is identical to the old one on
    NULL-free tables — spot-check against the unpruned rule set."""
    from desbordante_spark.discovery.cfd_miner import discover_cfds

    rows = [
        ("s", "w", "h"), ("s", "w", "h"), ("r", "c", "l"),
        ("r", "c", "l"), ("s", "c", "h"), ("r", "w", "l"),
    ]
    df = spark.createDataFrame(rows, "o string, t string, p string")
    pruned = discover_cfds(
        df, min_support=2, min_confidence=1.0, max_lhs=1,
        prune_specializations_of_exact=True,
    ).collect()
    unpruned = discover_cfds(
        df, min_support=2, min_confidence=1.0, max_lhs=1,
    ).collect()
    # pruning only ever removes rules, never invents them
    up = {(r["lhs_pattern"], r["rhs"]) for r in unpruned}
    assert {(r["lhs_pattern"], r["rhs"]) for r in pruned} <= up
    # o=_ -> p=_ holds exactly (o and p are 1:1) and must survive
    assert ("o=_", "p=_") in {(r["lhs_pattern"], r["rhs"]) for r in pruned}


# ------------------------------------------------- HyFD sampler de-skewing

def test_sampler_salts_heavy_clusters(spark):
    """VERDICT item 3 — a constant-heavy 1M+-row frame must not sort in a
    single (column, value) window partition: oversized clusters are salted
    into bounded buckets, and the sampled agree sets stay sound."""
    from desbordante_spark.discovery.hyfd import sample_agree_sets

    n = 1_200_000
    df = spark.range(n).select(
        F.lit("k").alias("g"),  # one 1.2M-row cluster
        F.concat(F.lit("u"), F.col("id")).alias("u"),  # unique
        (F.col("id") % 2).cast("string").alias("h"),  # two 600k clusters
    )
    stats: dict = {}
    sets = sample_agree_sets(
        df, ["g", "u", "h"], max_cluster_rows=200_000, stats=stats
    )
    # g's cluster and both h clusters exceed the bound
    assert stats["salted_clusters"] == 3
    assert sets, "salting must not empty the sample"
    for aset, cnt in sets:
        assert "g" in aset  # every real pair agrees on the constant column
        assert "u" not in aset  # no pair agrees on a unique column
        assert cnt > 0


def test_hybrid_discovery_with_salting_matches_tane(spark):
    """Salting only shrinks the negative cover — the validator keeps the
    output exact. Compare against the levelwise miner on a skewed frame."""
    from desbordante_spark.discovery.hyfd import discover_fds_hybrid
    from desbordante_spark.discovery.tane import discover_fds

    df = spark.range(50_000).select(
        F.lit("c").alias("const"),
        (F.col("id") % 100).cast("string").alias("a"),
        (F.col("id") % 10).cast("string").alias("b"),
        ((F.col("id") % 100) % 10).cast("string").alias("d"),  # a -> d
    )
    hybrid = discover_fds_hybrid(df, max_lhs=2, max_agree_sets=500)
    exact = discover_fds(df, max_lhs=2)
    assert sorted(hybrid) == sorted(exact)


def test_sampler_content_order_default_deterministic(spark):
    """VERDICT item 9 — content_order defaults to True: the sample is a
    pure function of the data, invariant to partition layout."""
    from desbordante_spark.discovery.hyfd import sample_agree_sets

    rows = [(str(i % 7), str(i % 3), str(i)) for i in range(500)]
    a = spark.createDataFrame(rows, "x string, y string, z string")
    b = a.repartition(7)  # different layout, same content
    sa = sample_agree_sets(a, ["x", "y", "z"])
    sb = sample_agree_sets(b, ["x", "y", "z"])
    assert sa == sb


# ------------------------------------------------------ HyUCC hybrid miner

def _norm_uccs(uccs):
    return sorted((tuple(sorted(u)) for u in uccs), key=lambda s: (len(s), s))


def test_hyucc_matches_levelwise_on_testfd(spark, testfd):
    """VERDICT item 4 — the reference pins HyUCC to the verifier's result
    set (test_ucc_verifier.cpp:96-123); here: identical output to the
    levelwise miner on the reference golden table."""
    from desbordante_spark.discovery.hyucc import discover_uccs_hybrid
    from desbordante_spark.discovery.tane import discover_uccs

    df = testfd.drop("row_id")
    hybrid = discover_uccs_hybrid(df, max_size=3)
    level = discover_uccs(df, max_size=3)
    assert _norm_uccs(hybrid) == _norm_uccs(level)


def test_hyucc_matches_levelwise_generated(spark):
    from desbordante_spark.discovery.hyucc import discover_uccs_hybrid
    from desbordante_spark.discovery.tane import discover_uccs

    df = spark.range(10_000).select(
        F.col("id").cast("string").alias("pk"),
        (F.col("id") % 100).cast("string").alias("a"),
        (F.col("id") % 101).cast("string").alias("b"),  # (a, b) unique
        F.lit("k").alias("const"),
    )
    hybrid = discover_uccs_hybrid(df, max_size=2)
    level = discover_uccs(df, max_size=2)
    assert _norm_uccs(hybrid) == _norm_uccs(level)
    assert ("pk",) in hybrid and ("a", "b") in hybrid


def test_hyucc_two_phase_matches_exact(spark, testfd):
    from desbordante_spark.discovery.hyucc import discover_uccs_hybrid

    df = testfd.drop("row_id")
    assert _norm_uccs(discover_uccs_hybrid(df, max_size=2, exact=False)) == \
        _norm_uccs(discover_uccs_hybrid(df, max_size=2, exact=True))


def test_hyucc_lattice_skip_evidence(spark):
    """On a wide table the sampled negative cover must leave the validator
    far fewer candidates than the full lattice."""
    from desbordante_spark.discovery.hyucc import discover_uccs_hybrid

    cols = [F.col("id").cast("string").alias("pk")] + [
        (F.col("id") % m).cast("string").alias(f"c{i}")
        for i, m in enumerate([2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    ]
    df = spark.range(5_000).select(*cols)  # 12 columns
    stats: dict = {}
    uccs = discover_uccs_hybrid(df, max_size=3, stats=stats)
    assert ("pk",) in uccs
    assert stats["validated_candidates"] < stats["full_lattice_candidates"] / 3


# ----------------------------------------------------- Pyro AFD traversal

def test_pyro_matches_levelwise(spark, testfd):
    """VERDICT item 6 — Pyro's estimate-driven traversal: estimates only
    steer the walk, every classification is exact, so the output is
    IDENTICAL to the levelwise miner (not just in expectation)."""
    from desbordante_spark.discovery.pfdtane import discover_afds
    from desbordante_spark.discovery.pyro import discover_afds_pyro

    df = testfd.drop("row_id")
    for thr, meas in ((0.05, "per_tuple"), (0.3, "g1")):
        a = discover_afds(df, max_lhs=2, max_error=thr, error_measure=meas)
        b = discover_afds_pyro(
            df, max_lhs=2, max_error=thr, error_measure=meas
        )
        assert a == b, (thr, meas)


def test_pyro_skips_lattice_nodes(spark):
    """The node-visit evidence: on a deep lattice (8 columns, max_lhs=4)
    where a key column settles every RHS at level 1, the traversal
    classifies whole non-dependency subspaces via maximal non-deps and
    exactly scores FAR fewer candidates than levelwise enumeration."""
    from desbordante_spark.discovery.pfdtane import discover_afds
    from desbordante_spark.discovery.pyro import discover_afds_pyro

    cols = [F.col("id").cast("string").alias("k")] + [
        F.xxhash64(F.col("id"), F.lit(i)).cast("string")
        .substr(-1, 1).alias(f"c{i}")
        for i in range(7)
    ]
    df = spark.range(1500).select(*cols).cache()
    s1: dict = {}
    s2: dict = {}
    a = discover_afds(df, max_lhs=4, max_error=0.05, stats=s1)
    b = discover_afds_pyro(df, max_lhs=4, max_error=0.05, stats=s2)
    assert a == b
    assert s2["exact_scored"] < s1["exact_scored"] * 0.6, (s1, s2)
