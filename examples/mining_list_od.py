"""List-based order dependencies — mirrors /root/reference/examples/
mining_list_od.py on the verification side: does ordering by the LHS column
list order the RHS within each context partition?"""

from __future__ import annotations

from desbordante_spark.operators.od import od_verify


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    res = od_verify(lineitem, ["l_linenumber"], ["l_quantity"],
                    context=["l_orderkey"])
    print(f"OD [l_linenumber] orders [l_quantity] per order: {res.holds} "
          f"({res.num_violating_clusters}/{res.total_rows} groups swap)")

    res2 = od_verify(lineitem, ["l_linenumber", "l_quantity"],
                     ["l_extendedprice"], context=["l_orderkey"])
    print(f"OD [l_linenumber, l_quantity] orders [l_extendedprice]: "
          f"{res2.holds} ({res2.num_violating_clusters} swaps)")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-od"))
