"""Iceberg helpers degrade cleanly without the runtime jars."""

import pytest

from desbordante_spark.sources.iceberg import (
    current_snapshot_id,
    iceberg_available,
    read_snapshot,
)


def test_iceberg_unavailable_is_clean(spark):
    assert iceberg_available(spark) is False  # container has no jars
    with pytest.raises(RuntimeError, match="Iceberg runtime not on the classpath"):
        current_snapshot_id(spark, "lake.db.docs")
    with pytest.raises(RuntimeError):
        read_snapshot(spark, "lake.db.docs")


def test_snapshot_incremental_drift_guards(spark):
    """column= is mandatory when specs is ambiguous; the jar guard fires
    before any read. (The state-fold semantics themselves are covered
    engine-side in tests/test_profile_state.py — this is the Iceberg
    wrapper's contract.)"""
    from desbordante_spark.sources.iceberg import snapshot_incremental_drift

    state = spark.createDataFrame(
        [], "partition string, column string, bucket string, cnt long"
    )
    with pytest.raises(ValueError, match="column= required"):
        snapshot_incremental_drift(
            spark, "lake.db.docs", state,
            {"a": 1.0, "b": 2.0}, "s1",
        )
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        snapshot_incremental_drift(
            spark, "lake.db.docs", state, {"a": 1.0}, "s1",
        )
