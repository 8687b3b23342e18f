"""Algebraic constraints — mirrors /root/reference/examples/
algebraic_constraints.py: learn disjoint ranges for a column expression
(here price/quantity) from a sample, then surface the rows that escape
every learned range."""

from __future__ import annotations

from desbordante_spark.operators.ac import (
    ac_build_ranges,
    ac_exceptions,
    ac_verify,
)


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ranges = ac_build_ranges(lineitem, "l_extendedprice", "l_quantity", "/",
                             sample_fraction=0.2, weight=0.1)
    print(f"learned {len(ranges)} range(s): "
          + ", ".join(f"[{lo:.1f}, {hi:.1f}]" for lo, hi in ranges[:4]))
    exc = ac_exceptions(lineitem, "l_extendedprice", "l_quantity", "/",
                        ranges=ranges)
    print(f"rows escaping every learned range: {exc.count()}")
    res = ac_verify(lineitem, "l_extendedprice", "l_quantity", "/",
                    sample_fraction=0.2, weight=0.1)
    print(f"exception fraction on the full table: "
          f"{res['exception_fraction']:.6f} "
          f"({res['num_exceptions']}/{res['total_rows']})")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-ac"))
