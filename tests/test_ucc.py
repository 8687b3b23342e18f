"""UCC/AUCC golden tests transplanted from the reference
(src/tests/test_ucc_verifier.cpp:64-92): exact (holds, #violating clusters,
#violating rows, AUCC error) and exact violating row-id clusters."""

from __future__ import annotations

import pytest

from desbordante_spark.operators.ucc import (
    ucc_verify,
    ucc_violating_clusters,
)

N = 12  # rows in TestFD
DEN = N * (N - 1)


# (columns-by-index, num_violating_clusters, num_violating_rows, error)
# from test_ucc_verifier.cpp:77-92
GOLDEN = [
    (["Col0"], 1, 12, 12 * 11 / DEN),
    (["Col0", "Col1"], 4, 12, 4 * 3 * 2 / DEN),
    (["Col0", "Col1", "Col2"], 4, 8, 4 * 2 * 1 / DEN),
    (["Col0", "Col1", "Col2", "Col3", "Col4", "Col5"], 3, 6, 3 * 2 * 1 / DEN),
]


@pytest.mark.parametrize("cols,nvc,nvr,err", GOLDEN)
def test_ucc_golden_metrics(testfd, cols, nvc, nvr, err):
    res = ucc_verify(testfd, cols, row_id="row_id")
    assert res.num_violating_clusters == nvc
    assert res.num_violating_rows == nvr
    assert res.error == pytest.approx(err, abs=1e-12)
    assert res.holds == (nvc == 0)
    assert res.total_rows == N


def _clusters(df, cols):
    rows = ucc_violating_clusters(df, cols, "row_id").collect()
    return sorted(tuple(r["row_ids"]) for r in rows)


def test_ucc_clusters_col01(testfd):
    # test_ucc_verifier.cpp:84: {0,1} -> {{0,1,2},{3,4,5},{6,7,8},{9,10,11}}
    assert _clusters(testfd, ["Col0", "Col1"]) == [
        (0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11)
    ]


def test_ucc_clusters_col012(testfd):
    # {0,1,2} -> {{0,1},{3,4},{6,7},{9,10}}
    assert _clusters(testfd, ["Col0", "Col1", "Col2"]) == [
        (0, 1), (3, 4), (6, 7), (9, 10)
    ]


def test_ucc_clusters_all_cols(testfd):
    # all columns -> {{3,4},{6,7},{9,10}}
    cols = ["Col0", "Col1", "Col2", "Col3", "Col4", "Col5"]
    assert _clusters(testfd, cols) == [(3, 4), (6, 7), (9, 10)]


def test_ucc_holds_on_unique_key(testfd):
    res = ucc_verify(testfd, ["row_id"])
    assert res.holds and res.error == 0.0
    assert res.num_violating_clusters == 0
    assert res.violations.count() == 0


def test_aucc_threshold(testfd):
    # AUCC holds once the threshold admits the measured error
    res = ucc_verify(testfd, ["Col0", "Col1"], error_threshold=0.5)
    assert res.holds
    res2 = ucc_verify(testfd, ["Col0", "Col1"], error_threshold=0.1)
    assert not res2.holds


def test_evidence_cap(testfd):
    rows = ucc_violating_clusters(testfd, ["Col0"], "row_id", evidence_cap=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cluster_size"] == 12
    assert list(r["row_ids"]) == [0, 1, 2, 3, 4]
    assert r["truncated"]


def test_null_semantics(spark):
    # NullEmpty-style fixture (F5): with null==null, nulls form one cluster;
    # with null!=null, null rows are dropped (position_list_index.cpp:53-59).
    df = spark.createDataFrame(
        [(0, None), (1, None), (2, "a"), (3, "a"), (4, "b")],
        ["row_id", "v"],
    )
    eq = ucc_verify(df, ["v"], is_null_equal_null=True)
    assert eq.num_violating_clusters == 2
    assert eq.num_violating_rows == 4
    neq = ucc_verify(df, ["v"], is_null_equal_null=False)
    assert neq.num_violating_clusters == 1
    assert neq.num_violating_rows == 2
    assert neq.total_rows == 3


def test_salted_two_phase_agrees(testfd):
    from desbordante_spark.operators.ucc import ucc_metrics_df

    plain = ucc_metrics_df(testfd, ["Col0", "Col1"]).collect()[0].asDict()
    salted = ucc_metrics_df(testfd, ["Col0", "Col1"], salt=8).collect()[0].asDict()
    assert plain == salted


def test_evidence_cap_hot_key(spark):
    # pathological cluster: one key owns 50k of 60k rows — counts stay exact,
    # evidence is capped, nothing materializes beyond the cap
    from pyspark.sql import functions as F

    from desbordante_spark.operators.ucc import (
        ucc_verify,
        ucc_violating_clusters,
    )

    df = spark.range(60_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 50_000, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
    )
    res = ucc_verify(df, ["k"])
    assert res.num_violating_clusters == 1
    assert res.num_violating_rows == 50_000
    ev = ucc_violating_clusters(df, ["k"], "row_id", evidence_cap=100).collect()
    assert len(ev) == 1
    assert ev[0]["cluster_size"] == 50_000
    assert len(ev[0]["row_ids"]) == 100
    assert ev[0]["truncated"]
