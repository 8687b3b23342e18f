"""Dynamic (incremental) AFD verification — mirrors /root/reference/
examples/dynamic_verifying_afd.py: the same count state as dynamic FD
verification, read with an error threshold — approximate verdicts over
insert/delete batches without rescanning the base table."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.operators.dynamic import (
    fd_metrics_from_state,
    fd_state_init,
    state_apply,
)
from desbordante_spark.operators.fd import fd_metrics_df

THRESH = 0.6


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    okey = F.col("o_orderkey")
    lhs, rhs = ["o_custkey"], ["o_orderstatus"]

    base = orders.filter(okey % 4 != 0)
    state = fd_state_init(base, lhs, rhs)
    v0 = fd_metrics_from_state(state, lhs, error_threshold=THRESH).collect()[0]
    print(f"base: error {v0['error']:.4f}, holds@{THRESH}: {bool(v0['holds'])}")

    state = state_apply(
        state, [*lhs, *rhs],
        inserts=orders.filter(okey % 4 == 0),
        deletes=base.filter(okey % 7 == 0),
    )
    v1 = fd_metrics_from_state(state, lhs, error_threshold=THRESH).collect()[0]
    print(f"after CRUD batch: error {v1['error']:.4f},"
          f" holds@{THRESH}: {bool(v1['holds'])}")

    final = orders.filter((okey % 4 == 0) | (okey % 7 != 0))
    vb = fd_metrics_df(final, lhs, rhs, error_threshold=THRESH).collect()[0]
    assert (v1["total_rows"], v1["error"], v1["holds"]) == (
        vb["total_rows"], vb["error"], vb["holds"]
    )
    print("incremental AFD verdict == batch recompute: verified")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-dynamic-afd"))
