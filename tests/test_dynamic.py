"""Incremental (batch-CRUD) verification — cross-validated against full
recompute after each batch (the reference's dynamic-verifier agreement
property, src/tests/test_dynamic_fd_verifier.cpp pattern)."""

from __future__ import annotations

import pytest

from desbordante_spark.operators.dynamic import (
    fd_metrics_from_state,
    fd_state_init,
    state_apply,
    ucc_metrics_from_state,
    ucc_state_init,
)
from desbordante_spark.operators.fd import fd_metrics_df
from desbordante_spark.operators.ucc import ucc_metrics_df


def _row(df):
    return df.collect()[0].asDict()


def test_incremental_fd_agrees_with_full(spark, testfd):
    lhs, rhs = ["Col3"], ["Col4"]
    state = fd_state_init(testfd, lhs, rhs).cache()
    assert _row(fd_metrics_from_state(state, lhs)) == _row(
        fd_metrics_df(testfd, lhs, rhs)
    )
    # batch 1: insert two rows (one creates a new conflict)
    ins = spark.createDataFrame(
        [("999", "555"), ("0", "8")], "Col3 string, Col4 string"
    )
    state2 = state_apply(state, ["Col3", "Col4"], inserts=ins).cache()
    full2 = testfd.select("Col3", "Col4").union(ins)
    assert _row(fd_metrics_from_state(state2, lhs)) == _row(
        fd_metrics_df(full2, lhs, rhs)
    )
    # batch 2: delete the '999' cluster entirely (update semantics =
    # delete old + insert new)
    dels = spark.createDataFrame(
        [("999", "-"), ("999", "555")], "Col3 string, Col4 string"
    )
    state3 = state_apply(state2, ["Col3", "Col4"], deletes=dels)
    full3 = full2.exceptAll(dels)
    assert _row(fd_metrics_from_state(state3, lhs)) == _row(
        fd_metrics_df(full3, lhs, rhs)
    )


def test_incremental_ucc_agrees_with_full(spark, testfd):
    cols = ["Col0", "Col1"]
    state = ucc_state_init(testfd, cols)
    assert _row(ucc_metrics_from_state(state)) == _row(
        ucc_metrics_df(testfd, cols)
    )
    ins = spark.createDataFrame([("1", "9")], "Col0 string, Col1 string")
    state2 = state_apply(state, cols, inserts=ins)
    full2 = testfd.select(*cols).union(ins)
    assert _row(ucc_metrics_from_state(state2)) == _row(
        ucc_metrics_df(full2, cols)
    )
    # deleting one row of a duplicate pair resolves that cluster
    dels = spark.createDataFrame([("1", "1")], "Col0 string, Col1 string")
    state3 = state_apply(state2, cols, deletes=dels)
    full3 = full2.exceptAll(dels)
    assert _row(ucc_metrics_from_state(state3)) == _row(
        ucc_metrics_df(full3, cols)
    )


def test_state_drops_zero_counts(spark):
    df = spark.createDataFrame([("a",), ("a",)], "k string")
    state = ucc_state_init(df, ["k"])
    dels = spark.createDataFrame([("a",), ("a",)], "k string")
    state2 = state_apply(state, ["k"], deletes=dels)
    assert state2.count() == 0
    m = _row(ucc_metrics_from_state(state2))
    assert m["total_rows"] == 0 and m["holds"] == 1
