"""Conditional FDs — mirrors /root/reference/examples/mining_cfd.py
semantics on the verification side: a pattern tableau of constant/wildcard
rows with per-pattern support and confidence (cfd_minsup / cfd_minconf)."""

from __future__ import annotations

from desbordante_spark.operators.cfd import (
    cfd_tableau_metrics_df,
    cfd_tableau_verify,
)


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    tableau = [
        {"o_orderstatus": "F"},
        {"o_orderstatus": "O"},
        {"o_orderstatus": "P"},
    ]
    rows = cfd_tableau_metrics_df(
        orders, ["o_custkey"], ["o_orderpriority"], tableau,
        error_threshold=0.001, min_support=50,
    ).collect()
    print("pattern tableau for (o_custkey -> o_orderpriority):")
    for r in rows:
        print(f"  [{r['pattern']}] support={r['support']} "
              f"confidence={r['confidence']:.5f} holds={bool(r['holds'])}")

    combined = cfd_tableau_verify(
        orders, ["o_custkey"], ["o_orderpriority"], tableau,
        error_threshold=0.001, min_support=50,
    )
    print(f"CFD (all tableau rows) holds: {combined.holds}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-cfd"))
