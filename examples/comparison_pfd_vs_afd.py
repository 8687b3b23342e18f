"""PFD vs AFD error measures — mirrors /root/reference/examples/
comparison_pfd_vs_afd.py: the same dependency scored with g1 (AFD) and the
PFD per_tuple / per_value measures side by side."""

from __future__ import annotations

from desbordante_spark.operators.fd import fd_metrics_df, pfd_metrics_df


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lhs, rhs = ["o_custkey"], ["o_orderpriority"]
    g1 = fd_metrics_df(orders, lhs, rhs).collect()[0]["error"]
    pt = pfd_metrics_df(orders, lhs, rhs,
                        error_measure="per_tuple").collect()[0]["error"]
    pv = pfd_metrics_df(orders, lhs, rhs,
                        error_measure="per_value").collect()[0]["error"]
    print(f"{lhs} -> {rhs}")
    print(f"  AFD g1 (conflicting ordered pairs / n²−n): {g1:.6f}")
    print(f"  PFD per_tuple (rows to change):            {pt:.6f}")
    print(f"  PFD per_value (avg per-cluster miss):      {pv:.6f}")
    print("g1 punishes big mixed clusters quadratically; per_tuple counts "
          "repair rows; per_value weighs every LHS value equally.")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-pfd-vs-afd"))
