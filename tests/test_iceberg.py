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
