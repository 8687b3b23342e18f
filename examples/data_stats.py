"""Column statistics — mirrors /root/reference/examples/data_stats.py: the
one-scan wide profile (exact mode) and the sketch-based mode for scale."""

from __future__ import annotations

from desbordante_spark.operators.stats import profile, top_k_words, word_stats


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = profile(lineitem, ["l_quantity", "l_returnflag"]).collect()
    for r in p:
        print(f"  {r['column']}: n={r['count_values']} "
              f"distinct={r['distinct_values']} min={r['min_value']} "
              f"max={r['max_value']} nulls={r['null_count']}")

    approx = profile(lineitem, ["l_extendedprice"], distinct_mode="approx")
    r = approx.collect()[0]
    print(f"  approx(l_extendedprice): distinct≈{r['distinct_values']} "
          f"quantiles={r['quantiles']}")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = word_stats(docs, "text").collect()[0]
    print(f"  documents.text: {ws['distinct_words']} distinct / "
          f"{ws['total_words']} total words")
    print("  top words:", [r["word"] for r in top_k_words(docs, "text",
                                                          k=5).collect()])


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-stats"))
