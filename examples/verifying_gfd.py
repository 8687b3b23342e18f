"""GFD verification — mirrors /root/reference/examples/verifying_gfd/:
pattern graph + premise/conclusion literals over a property graph, here the
orders–customer bipartite graph expressed as vertex/edge DataFrames."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.operators.gfd import gfd_verify


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vertices = cust.select(
        F.concat(F.lit("c"), "c_custkey").alias("vertex_id"),
        F.lit("customer").alias("label"),
        "c_mktsegment",
        F.lit(None).cast("string").alias("o_orderstatus"),
    ).unionByName(orders.select(
        F.concat(F.lit("o"), "o_orderkey").alias("vertex_id"),
        F.lit("order").alias("label"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        "o_orderstatus",
    ))
    edges = orders.select(
        F.concat(F.lit("o"), "o_orderkey").alias("src"),
        F.concat(F.lit("c"), "o_custkey").alias("dst"),
        F.lit("placed_by").alias("label"),
    )
    res = gfd_verify(
        vertices, edges,
        {"o": "order", "c": "customer"}, [("o", "c", "placed_by")],
        premises=[(("o", "o_orderstatus"), "F")],
        conclusion=[(("c", "c_mktsegment"), "BUILDING")],
    )
    print(f"GFD holds: {res.holds} — {res.num_violating_rows} of "
          f"{res.details['premise_matches']} premise-matching embeddings "
          "violate the conclusion")
    for r in res.violations.limit(3).collect():
        print(f"  order {r['o__id']} (status F) -> customer {r['c__id']} "
              f"(segment {r['c__c_mktsegment']})")

    # --- file-based flow (reference parser: .dot graph + GFD file) ---
    import os

    graph = "/root/reference/test_input_data/graph_data/directors.dot"
    gfd = "/root/reference/test_input_data/graph_data/directors_gfd.dot"
    if os.path.exists(graph):
        from desbordante_spark.sources.graph_dot import verify_gfd_files

        r2 = verify_gfd_files(spark, graph, gfd)
        print(f"directors.dot GFD holds: {r2.holds} "
              f"({r2.num_violating_rows} violating embedding(s) of "
              f"{r2.details['premise_matches']})")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-gfd"))
