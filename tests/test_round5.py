"""Round-5 fixes: ADVICE findings (Pyro per_value fallback, Spider AIND
null-cluster error, fastod NULL-safe context keys, typed rank encoding in
compat.Fastod) and VERDICT items (pair-mass-budgeted fastod chunking,
time_limit partial results)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------- pyro per_value

def test_pyro_per_value_delegates_to_levelwise(spark):
    """ADVICE pyro.py:144 — per_value is not anti-monotone, so the
    traversal must not coverage-prune with it; output must equal the
    levelwise miner's exactly (served by delegation)."""
    from desbordante_spark.discovery.pfdtane import discover_afds
    from desbordante_spark.discovery.pyro import discover_afds_pyro

    # the advisor's counterexample shape: splitting a cluster RAISES the
    # per_value error ({x:9,y:1} -> {x:1,y:1}+{x:8})
    rows = [("a" if i < 2 else "b", "x" if i != 1 else "y",
             "p" if i < 2 else "q") for i in range(10)]
    df = spark.createDataFrame(rows, "l string, r string, z string")
    stats: dict = {}
    got = discover_afds_pyro(
        df, max_lhs=2, max_error=0.2, error_measure="per_value",
        stats=stats,
    )
    want = discover_afds(
        df, max_lhs=2, max_error=0.2, error_measure="per_value"
    )
    assert got == want
    assert stats.get("fallback") == "levelwise_per_value"


def test_pyro_monotone_measures_still_traverse(spark, testfd):
    """g1/per_tuple keep the estimate-driven traversal (no fallback)."""
    from desbordante_spark.discovery.pyro import discover_afds_pyro

    stats: dict = {}
    discover_afds_pyro(
        testfd.select("Col0", "Col1", "Col5"), max_lhs=2,
        max_error=0.05, error_measure="g1", stats=stats,
    )
    assert "fallback" not in stats
    assert stats["rounds"] >= 1


# ------------------------------------------------- spider AIND nulls

def test_spider_aind_null_singleton_clusters(spark):
    """ADVICE spider.py:85 — with equal_nulls=False and max_error>0,
    null-bearing LHS columns are no longer blanket-excluded: each null
    row adds one unmatched singleton cluster to the error denominator."""
    from desbordante_spark.discovery.spider import discover_unary_inds

    # a: {1,2,3, NULL, NULL} (2 null rows), b: {1,2,3,4}
    t1 = spark.createDataFrame(
        [("1",), ("2",), ("3",), ("NULL",), ("NULL",)], "a string"
    )
    t2 = spark.createDataFrame([("1",), ("2",), ("3",), ("4",)], "b string")
    out = discover_unary_inds(
        {"t1": t1, "t2": t2}, max_error=0.5,
        null_value="NULL", equal_nulls=False,
    ).collect()
    got = {(r["lhs"], r["rhs"]): r for r in out}
    # a ⊆ b: 3 matched distinct values, denominator 3 distinct + 2 null
    # rows = 5 -> error 0.4 (was: excluded outright)
    assert ("t1.a", "t2.b") in got
    r = got[("t1.a", "t2.b")]
    assert r["lhs_distinct"] == 3
    assert abs(r["error"] - 0.4) < 1e-12
    assert r["holds"] == 1


def test_spider_exact_ind_null_exclusion_unchanged(spark):
    """max_error=0 keeps the reference's exact semantics: a singleton
    null cluster can never be covered, so the null-bearing LHS yields
    no exact INDs."""
    from desbordante_spark.discovery.spider import discover_unary_inds

    t1 = spark.createDataFrame([("1",), ("2",), ("NULL",)], "a string")
    t2 = spark.createDataFrame([("1",), ("2",), ("3",)], "b string")
    out = discover_unary_inds(
        {"t1": t1, "t2": t2}, max_error=0.0,
        null_value="NULL", equal_nulls=False,
    ).collect()
    assert all(r["lhs"] != "t1.a" for r in out)


# ------------------------------------------------ fastod NULL contexts

def test_fastod_constancy_null_contexts(spark):
    """ADVICE fastod.py:101 — ('a', NULL) and (NULL, 'a') contexts must
    not collapse: with them distinguished, c is NOT constant per (a, b)
    group in this frame, so no simple OD {a,b}: [] -> c is reported."""
    from desbordante_spark.discovery.fastod import _constancy_checks

    df = spark.createDataFrame(
        [("a", None, 1), (None, "a", 2)],
        "a string, b string, c int",
    )
    ok = _constancy_checks(df, [(("a", "b"), "c")])
    assert ok == [True]  # two distinct groups, each constant
    df2 = spark.createDataFrame(
        [("a", None, 1), ("a", None, 2)],
        "a string, b string, c int",
    )
    assert _constancy_checks(df2, [(("a", "b"), "c")]) == [False]


# ------------------------------------- fastod chunk budget + time limit

def test_fastod_pair_mass_budgeted_chunk(spark):
    """VERDICT #3 — per-job exploded volume stays under the budget on a
    tall frame: chunk = budget // n_rows, never the fixed 4000."""
    from desbordante_spark.discovery.fastod import discover_ods_fastod

    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("a"), (F.col("id") % 2).alias("b")
    )
    stats: dict = {}
    discover_ods_fastod(
        df, stats=stats, pair_mass_budget=100_000
    )
    assert stats["n_rows"] == 20_000
    assert stats["chunk_size"] == 5  # 100_000 // 20_000
    assert stats["complete"] is True


def test_fastod_chunk_budget_golden_unchanged(spark):
    """A tiny budget (chunk forced to 1) must not change results —
    the BernoulliRelation golden still replays exactly."""
    from test_fastod_golden import fastod_result_hash, load_numeric

    from desbordante_spark.discovery.fastod import discover_ods_fastod

    df, cols = load_numeric(spark, "BernoulliRelation.csv")
    stats: dict = {}
    res = discover_ods_fastod(
        df, columns=cols, stats=stats, pair_mass_budget=1
    )
    assert stats["chunk_size"] == 1
    assert fastod_result_hash(res) == 6518269127574092257


def test_fastod_time_limit_partial(spark):
    """VERDICT #3 — an expired time limit returns the partial result set
    cleanly with complete=False (fastod.h:31, fastod.cpp:18-19)."""
    from desbordante_spark.discovery.fastod import discover_ods_fastod

    df = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 4), (3, 4, 5)], "a int, b int, c int"
    )
    stats: dict = {}
    res = discover_ods_fastod(df, stats=stats, time_limit=1e-9)
    assert stats["complete"] is False
    assert res == {"asc": [], "desc": [], "simple": []}
    # unlimited run on the same frame completes
    stats2: dict = {}
    full = discover_ods_fastod(df, stats=stats2)
    assert stats2["complete"] is True
    assert full["asc"] or full["desc"] or full["simple"]


# --------------------------------------------- compat Fastod encoding

def test_compat_fastod_numeric_text_equivalence(spark, tmp_path):
    """ADVICE compat.py:369 — textually distinct but numerically equal
    values ('1' vs '1.0' vs '01') must receive ONE rank in a
    numeric-deduced column, like the reference's typed comparator."""
    import desbordante_spark.compat as desbordante

    p = tmp_path / "mixedfmt.csv"
    p.write_text("a,b\n1,x\n1.0,x\n01,x\n2,y\n")
    algo = desbordante.od.algorithms.Fastod()
    algo.load_data(table=(str(p), ",", True))
    algo.execute()
    # a <-> b are mutually constant per group only if '1'=='1.0'=='01';
    # the simple OD {1}: [] -> 2 (b constant per a-group) must hold
    assert "{1} : [] -> 2<=" in algo.get_simple_ods()


# --------------------------------------------- auto AFD strategy selection

def _regime_frame(spark, regime: str):
    """dense: most level-1 pairs are near-FDs (mod chains). deep: a clean
    composite key with independent noise columns — no shallow deps."""
    rows = []
    for i in range(400):
        if regime == "dense":
            rows.append((i % 8, i % 8, i % 16, i % 16))
        else:
            rows.append((i // 20, i % 20, (i * 7919) % 13, (i * 104729) % 11))
    return spark.createDataFrame(
        [tuple(str(v) for v in r) for r in rows],
        "a string, b string, c string, d string",
    )


def test_afd_auto_picks_levelwise_in_dense_regime(spark):
    from desbordante_spark.discovery.pfdtane import discover_afds
    from desbordante_spark.discovery.pyro import discover_afds_auto

    df = _regime_frame(spark, "dense")
    stats: dict = {}
    got = discover_afds_auto(df, max_lhs=2, max_error=0.3, stats=stats)
    assert stats["chosen"] == "levelwise"
    assert stats["density"] >= 0.15
    assert got == discover_afds(df, max_lhs=2, max_error=0.3)


def test_afd_auto_picks_traversal_in_deep_regime(spark):
    from desbordante_spark.discovery.pfdtane import discover_afds
    from desbordante_spark.discovery.pyro import discover_afds_auto

    df = _regime_frame(spark, "deep")
    stats: dict = {}
    got = discover_afds_auto(df, max_lhs=3, max_error=0.01, stats=stats)
    assert stats["chosen"] == "traversal"
    assert stats["density"] < 0.15
    assert got == discover_afds(df, max_lhs=3, max_error=0.01)


def test_afd_auto_per_value_always_levelwise(spark, testfd):
    from desbordante_spark.discovery.pfdtane import discover_afds
    from desbordante_spark.discovery.pyro import discover_afds_auto

    df = testfd.drop("row_id")
    stats: dict = {}
    got = discover_afds_auto(
        df, max_lhs=2, max_error=0.3, error_measure="per_value",
        stats=stats,
    )
    assert stats["chosen"] == "levelwise_per_value"
    assert got == discover_afds(
        df, max_lhs=2, max_error=0.3, error_measure="per_value"
    )


# --------------------------------------------- injective grouping keys

def test_group_key_no_cross_column_collision(spark):
    """Code-review finding: concat_ws keys collided when a value contained
    the separator byte or equalled the null sentinel. The length-prefixed
    group_key must keep ('a\\x01b','c') and ('a','b\\x01c') distinct, and a
    literal '\\x00∅' value distinct from NULL — exact distinct counts,
    pair masses, UCC/FD verdicts and AFD scores all ride on it."""
    from desbordante_spark.discovery.common import (
        NULL,
        distinct_count_level,
        pair_mass_level,
    )
    from desbordante_spark.discovery.tane import discover_uccs

    df = spark.createDataFrame(
        [("a\x01b", "c"), ("a", "b\x01c"), ("a\x01b", "e"), ("a", "e")],
        "x string, y string",
    )
    got = distinct_count_level(df, [("x", "y")])
    assert got[0] == 4  # pre-fix: rows 1+2 concat-collide -> 3
    ep, n = pair_mass_level(df, [("x", "y")])[0]
    assert (ep, n) == (0, 4)
    # x and y are individually non-unique; (x, y) IS the minimal key —
    # the collision made it look non-unique and dropped it
    assert [sorted(u) for u in discover_uccs(df, max_size=2)] == [["x", "y"]]

    df2 = spark.createDataFrame(
        [(NULL, "v"), (None, "v")], "x string, y string"
    )
    got2 = distinct_count_level(df2, [("x",), ("x", "y")])
    assert got2[0] == 2 and got2[1] == 2  # sentinel value != real NULL


def test_afd_scores_no_separator_collision(spark):
    from desbordante_spark.discovery.pfdtane import _score_level

    # two LHS clusters, each internally consistent on rhs -> error 0;
    # a concat collision would merge them into one split cluster
    df = spark.createDataFrame(
        [("a\x01b", "c", "1"), ("a", "b\x01c", "2")],
        "x string, y string, r string",
    )
    got = _score_level(df, [(("x", "y"), "r")], "per_tuple")
    assert got[0] == 0.0


def test_afd_auto_single_column_no_probe_crash(spark):
    """Code-review finding: the level-1 probe crashed on 1-column frames
    (empty candidate list -> F.array() of zero structs fails analysis);
    delegation must bypass the probe."""
    from desbordante_spark.discovery.pyro import discover_afds_auto

    df = spark.createDataFrame([("1",), ("2",), ("2",)], "a string")
    stats: dict = {}
    got = discover_afds_auto(df, max_lhs=2, max_error=0.3, stats=stats)
    assert stats["chosen"] == "levelwise"
    assert got == []


def test_afd_auto_max_lhs_1_skips_probe(spark, testfd):
    """max_lhs=1: probing would duplicate the whole lattice — the auto
    wrapper must run levelwise once, no probe job."""
    from desbordante_spark.discovery.pfdtane import discover_afds
    from desbordante_spark.discovery.pyro import discover_afds_auto

    df = testfd.drop("row_id")
    stats: dict = {}
    got = discover_afds_auto(df, max_lhs=1, max_error=0.3, stats=stats)
    assert stats["chosen"] == "levelwise"
    assert stats["density"] is None  # probe skipped
    assert got == discover_afds(df, max_lhs=1, max_error=0.3)
