"""Association-rule mining — mirrors /root/reference/examples/mining_ar.py:
transactions from (tid, item) rows, minsup/minconf thresholds, rules with
confidence and support (reference Apriori ≡ Spark ML FPGrowth — same rule
semantics, better distributed algorithm)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.operators.ar import (
    frequent_itemsets,
    mine_association_rules,
    transactions_from,
)


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # one transaction per user: the set of event types they triggered
    tx = transactions_from(
        events.select(F.col("user_id").alias("tid"),
                      F.col("event_type").alias("item")),
        "singular",
    )

    freq = frequent_itemsets(tx, min_support=0.2)
    print("frequent itemsets (support >= 0.2):")
    for r in freq.orderBy(F.desc("support")).limit(5).collect():
        print(f"  {sorted(r['items'])}  support={r['support']:.3f}")

    rules = mine_association_rules(tx, min_support=0.2, min_confidence=0.6)
    print("rules (conf >= 0.6):")
    for r in rules.orderBy(F.desc("confidence")).limit(5).collect():
        print(f"  {sorted(r['antecedent'])} => {sorted(r['consequent'])}"
              f"  conf={r['confidence']:.3f} lift={r['lift']:.3f}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-mine-ar"))
