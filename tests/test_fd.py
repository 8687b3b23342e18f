"""FD/AFD golden tests transplanted from the reference
(src/tests/test_fd_verifier.cpp:87-123): exact
(num_error_clusters, num_error_rows, error) with denominator n^2-n = 132."""

from __future__ import annotations

import pytest

from desbordante_spark.operators.fd import fd_highlights, fd_verify

DEN = 12 * 12 - 12  # 132


# (lhs, rhs, num_error_clusters, num_error_rows, error_numerator)
# from test_fd_verifier.cpp:87-123 via FIXTURES.md
GOLDEN = [
    (["Col1"], ["Col0"], 0, 0, 0),
    (["Col4"], ["Col3"], 1, 2, 2),
    (["Col3"], ["Col4"], 2, 10, 26),
    (["Col0"], ["Col1"], 1, 12, 108),
    (["Col1"], ["Col2"], 4, 12, 16),
    (["Col1"], ["Col2", "Col3"], 4, 12, 18),
    (["Col0", "Col1"], ["Col1", "Col4"], 2, 6, 8),
]


@pytest.mark.parametrize("lhs,rhs,nvc,nvr,num", GOLDEN)
def test_fd_golden(testfd, lhs, rhs, nvc, nvr, num):
    res = fd_verify(testfd, lhs, rhs)
    assert res.num_violating_clusters == nvc
    assert res.num_violating_rows == nvr
    assert res.error == pytest.approx(num / DEN, abs=1e-12)
    assert res.holds == (nvc == 0)


def test_afd_threshold(testfd):
    # AFD holds iff g1 <= threshold (fd_verifier.h:64-67)
    assert fd_verify(testfd, ["Col3"], ["Col4"], error_threshold=26 / DEN).holds
    assert not fd_verify(testfd, ["Col3"], ["Col4"], error_threshold=25 / DEN).holds


def test_fd_highlights(testfd):
    # {3}->{4}: clusters '0' (4 rows, 2 distinct rhs, prop 1/2) and
    # 'hjkl' (6 rows, 2 distinct rhs, prop 1/2); default sort by
    # most-frequent proportion desc, ties broken by lhs asc.
    rows = fd_highlights(testfd, ["Col3"], ["Col4"], "row_id").collect()
    assert len(rows) == 2
    by_key = {r["Col3"]: r for r in rows}
    assert by_key["0"]["cluster_size"] == 4
    assert by_key["0"]["num_distinct_rhs"] == 2
    assert by_key["0"]["most_frequent_rhs_proportion"] == pytest.approx(0.5)
    assert list(by_key["0"]["row_ids"]) == [1, 2, 6, 7]
    assert by_key["hjkl"]["cluster_size"] == 6
    assert list(by_key["hjkl"]["row_ids"]) == [3, 4, 5, 9, 10, 11]
    # conflict pairs: '0': 4*3-(2+2)=8 ; 'hjkl': 6*5-(6+6)=18
    assert by_key["0"]["conflict_pairs"] == 8
    assert by_key["hjkl"]["conflict_pairs"] == 18


def test_fd_null_semantics(spark):
    # lhs nulls dropped when null != null
    df = spark.createDataFrame(
        [(0, None, "x"), (1, None, "y"), (2, "a", "x"), (3, "a", "x")],
        ["row_id", "k", "v"],
    )
    eq = fd_verify(df, ["k"], ["v"], is_null_equal_null=True)
    assert not eq.holds and eq.num_violating_clusters == 1
    neq = fd_verify(df, ["k"], ["v"], is_null_equal_null=False, row_id="row_id")
    assert neq.holds


def test_fd_rhs_null_semantics(spark):
    # rhs nulls: with null==null the two nulls agree; with null!=null each
    # null row is its own RHS class -> cluster violates.
    df = spark.createDataFrame(
        [(0, "a", None), (1, "a", None)],
        "row_id long, k string, v string",
    )
    assert fd_verify(df, ["k"], ["v"], is_null_equal_null=True).holds
    res = fd_verify(df, ["k"], ["v"], is_null_equal_null=False, row_id="row_id")
    assert not res.holds
    assert res.error == pytest.approx(2 / 2, abs=1e-12)  # both ordered pairs conflict


def test_pfd_metrics(testfd):
    from desbordante_spark.operators.fd import pfd_metrics_df

    # {3}->{4}: clusters: '1.233'(keep 1/1), '0'(max 2 of 4), 'hjkl'(3 of 6),
    # '999'(1/1). per_tuple: 1 - (1+2+3+1)/12 = 5/12;
    # per_value: 1 - (1 + 0.5 + 0.5 + 1)/4 = 0.25
    pt = pfd_metrics_df(testfd, ["Col3"], ["Col4"], "per_tuple").collect()[0]
    assert pt["error"] == pytest.approx(5 / 12, abs=1e-12)
    assert pt["num_clusters"] == 4
    pv = pfd_metrics_df(testfd, ["Col3"], ["Col4"], "per_value").collect()[0]
    assert pv["error"] == pytest.approx(0.25, abs=1e-12)
    assert pfd_metrics_df(
        testfd, ["Col3"], ["Col4"], "per_tuple", error_threshold=0.5
    ).collect()[0]["holds"] == 1
