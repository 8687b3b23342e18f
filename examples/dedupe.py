"""Document deduplication — mirrors /root/reference/examples/dedupe.py
intent at corpus scale: exact dup groups, then MinHash-LSH near-duplicates
with exact Jaccard confirmation and cap accounting."""

from __future__ import annotations

from desbordante_spark.operators.dedup import (
    exact_duplicates,
    near_duplicates,
    simhash,
    simhash_near_pairs,
)


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    exact = exact_duplicates(docs, "doc_id", "text")
    print(f"exact duplicate groups: {exact.count()}")

    report: dict = {}
    near = near_duplicates(docs, "doc_id", "text", threshold=0.7,
                           dropped_report=report)
    print(f"MinHash-LSH near-dups (jaccard >= 0.7): {near.count()} "
          f"(capped buckets dropped: {report['n_buckets_dropped']})")

    fps = simhash(docs, "doc_id", "text")
    pairs = simhash_near_pairs(fps, max_hamming=3)
    print(f"SimHash near-pairs (hamming <= 3): {pairs.count()}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-dedupe"))
