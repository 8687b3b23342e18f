"""FD / AFD verification — mirrors /root/reference/examples/verifying_fd_afd.py
on the Spark-native API: verdict, highlights (clusters with most-frequent-RHS
proportion), and the AFD error threshold comparison."""

from __future__ import annotations

from desbordante_spark.operators.fd import fd_highlights, fd_verify


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    res = fd_verify(orders, ["o_custkey"], ["o_orderpriority"])
    print(f"FD o_custkey -> o_orderpriority holds: {res.holds}")
    print(f"g1 error = {res.error:.6f}, "
          f"violating clusters = {res.num_violating_clusters}")

    if not res.holds:
        top = fd_highlights(
            orders, ["o_custkey"], ["o_orderpriority"], row_id="o_orderkey",
            sort_by="proportion", evidence_cap=5,
        ).limit(3).collect()
        for h in top:
            print(f"  cluster o_custkey={h['o_custkey']}: "
                  f"size={h['cluster_size']}, "
                  f"distinct rhs={h['num_distinct_rhs']}, "
                  f"proportion={h['most_frequent_rhs_proportion']:.3f}, "
                  f"rows={h['row_ids']}")

    afd = fd_verify(orders, ["o_custkey"], ["o_orderpriority"],
                    error_threshold=res.error)
    print(f"AFD with threshold {res.error:.6f} holds: {afd.holds}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-fd"))
