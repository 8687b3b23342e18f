"""Metric-FD, order-dependency, and conditional-FD verification goldens
(hand-computed, mirroring the reference's small-fixture strategy —
src/tests/test_metric_verifier.cpp pattern)."""

from __future__ import annotations

import pytest

from desbordante_spark.operators.cfd import cfd_verify
from desbordante_spark.operators.mfd import mfd_cluster_diameters, mfd_verify
from desbordante_spark.operators.od import od_verify


# ------------------------------------------------------------------ MFD

@pytest.fixture(scope="module")
def mfd_num(spark):
    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.5),
        ("b", 5.0), ("b", 5.5),
        ("c", 7.0),
    ]
    return spark.createDataFrame(rows, "k string, v double").cache()


def test_mfd_euclid_1d(mfd_num):
    assert mfd_verify(mfd_num, ["k"], ["v"], parameter=2.5).holds
    res = mfd_verify(mfd_num, ["k"], ["v"], parameter=2.4)
    assert not res.holds
    assert res.num_violating_clusters == 1
    v = res.violations.collect()
    assert v[0]["k"] == "a" and v[0]["diameter"] == pytest.approx(2.5)


def test_mfd_euclid_nd(spark):
    rows = [("g", 0.0, 0.0), ("g", 3.0, 4.0), ("h", 1.0, 1.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    d = {
        r["k"]: r["diameter"]
        for r in mfd_cluster_diameters(df, ["k"], ["x", "y"]).collect()
    }
    assert d["g"] == pytest.approx(5.0)
    assert d["h"] == pytest.approx(0.0)
    assert mfd_verify(df, ["k"], ["x", "y"], parameter=5.0).holds
    assert not mfd_verify(df, ["k"], ["x", "y"], parameter=4.9).holds


def test_mfd_levenshtein(spark):
    rows = [("g1", "kitten"), ("g1", "sitting"), ("g2", "abc"), ("g2", "abc")]
    df = spark.createDataFrame(rows, "k string, s string")
    assert mfd_verify(df, ["k"], ["s"], parameter=3, metric="levenshtein").holds
    res = mfd_verify(df, ["k"], ["s"], parameter=2, metric="levenshtein")
    assert not res.holds
    v = res.violations.collect()
    assert len(v) == 1 and v[0]["k"] == "g1"
    assert v[0]["diameter"] == pytest.approx(3.0)


def test_mfd_cosine(spark):
    rows = [("g", "abcd", ), ("g", "abcd",), ("h", "aaaa",), ("h", "bbbb",)]
    df = spark.createDataFrame(rows, "k string, s string")
    d = {
        r["k"]: r["diameter"]
        for r in mfd_cluster_diameters(df, ["k"], ["s"], metric="cosine").collect()
    }
    assert d["g"] == pytest.approx(0.0)
    assert d["h"] == pytest.approx(1.0)  # disjoint q-grams


def test_mfd_null_inf(spark):
    rows = [("a", 1.0), ("a", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    assert mfd_verify(df, ["k"], ["v"], parameter=10.0).holds  # nulls ignored
    res = mfd_verify(df, ["k"], ["v"], parameter=10.0,
                     dist_from_null_is_infinity=True)
    assert not res.holds


# ------------------------------------------------------------------- OD

def test_od_holds(spark):
    rows = [(1, 10), (2, 20), (3, 30), (1, 15), (2, 20)]
    df = spark.createDataFrame(rows, "l long, r long")
    # max(l=1)=15 <= min(l=2)=20 <= max(l=2)=20 <= min(l=3)=30
    assert od_verify(df, "l", "r").holds


def test_od_swap(spark):
    rows = [(1, 30), (2, 10), (3, 40)]
    df = spark.createDataFrame(rows, "l long, r long")
    res = od_verify(df, "l", "r")
    assert not res.holds
    v = res.violations.collect()
    assert len(v) == 1 and v[0]["l"] == 2 and v[0]["prev_max_rhs"] == 30


def test_od_context(spark):
    rows = [("c1", 1, 10), ("c1", 2, 20), ("c2", 1, 99), ("c2", 2, 5)]
    df = spark.createDataFrame(rows, "ctx string, l long, r long")
    res = od_verify(df, "l", "r", context=["ctx"])
    assert not res.holds
    v = res.violations.collect()
    assert [(r["ctx"], r["l"]) for r in v] == [("c2", 2)]


def test_od_equal_boundary(spark):
    # equal rhs across adjacent lhs groups is NOT a swap
    rows = [(1, 10), (2, 10)]
    df = spark.createDataFrame(rows, "l long, r long")
    assert od_verify(df, "l", "r").holds


# ------------------------------------------------------------------ CFD

@pytest.fixture(scope="module")
def cfd_df(spark):
    rows = [
        ("A", "x", "p1"), ("A", "x", "p1"), ("A", "y", "p2"),
        ("B", "x", "p1"), ("B", "x", "p2"),
    ]
    return spark.createDataFrame(rows, "flag string, k string, v string").cache()


def test_cfd_variable(cfd_df):
    # FD k->v holds on flag='A' subset but not globally
    res = cfd_verify(cfd_df, ["k"], ["v"], pattern={"flag": "A"})
    assert res.holds and res.total_rows == 3
    res_all = cfd_verify(cfd_df, ["k"], ["v"])
    assert not res_all.holds


def test_cfd_constant(cfd_df):
    res = cfd_verify(
        cfd_df, ["k"], ["v"], pattern={"flag": "A", "k": "x"}, rhs_constant="p1"
    )
    assert res.holds and res.total_rows == 2
    bad = cfd_verify(
        cfd_df, ["k"], ["v"], pattern={"flag": "B", "k": "x"}, rhs_constant="p1"
    )
    assert not bad.holds
    assert bad.num_violating_rows == 1
    assert bad.error == pytest.approx(0.5)
