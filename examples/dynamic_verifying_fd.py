"""Dynamic (incremental) FD verification — mirrors /root/reference/examples/
dynamic_verifying_fd.py: keep a count state, apply insert/delete batches,
read verdicts without rescanning the base table."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.operators.dynamic import (
    fd_metrics_from_state,
    fd_state_init,
    state_apply,
)
from desbordante_spark.operators.fd import fd_metrics_df


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    okey = F.col("o_orderkey")
    lhs, rhs = ["o_custkey"], ["o_orderpriority"]

    base = orders.filter(okey % 3 != 0)
    state = fd_state_init(base, lhs, rhs)
    v0 = fd_metrics_from_state(state, lhs).collect()[0]
    print(f"base: {v0['total_rows']} rows, error {v0['error']:.6f}")

    inserts = orders.filter(okey % 3 == 0)
    deletes = base.filter(okey % 5 == 0)
    state = state_apply(state, [*lhs, *rhs], inserts=inserts, deletes=deletes)
    v1 = fd_metrics_from_state(state, lhs).collect()[0]
    print(f"after +{inserts.count()} / -{deletes.count()}: "
          f"{v1['total_rows']} rows, error {v1['error']:.6f}")

    # incremental verdict must be bit-identical to the batch recompute
    final = orders.filter((okey % 3 == 0) | (okey % 5 != 0))
    vb = fd_metrics_df(final, lhs, rhs).collect()[0]
    assert (v1["total_rows"], v1["error"]) == (vb["total_rows"], vb["error"])
    print("incremental == batch: verified")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-dynamic-fd"))
