"""Snapshot-incremental column profiling — the mergeable profile state
(north-rule extension, no reference analog): build the per-partition
state once, then fold append-only snapshot deltas in by re-aggregating
only the partitions each delta touches. Counts/min/max/sums stay exact;
distinct counts ride DataSketches HLL sketches (hll_sketch_agg /
hll_union_agg) and merge losslessly in sketch terms."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.operators.profile_state import (
    drift_from_state,
    hist_apply_incremental,
    hist_state_init,
    profile_apply_incremental,
    profile_from_state,
    profile_state_init,
)


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "part_key", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    )
    split = F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1)
    base = docs.filter(split < "8")        # "snapshot 1"
    delta = docs.filter(split >= "8")      # the appended rows of snapshot 2

    cols = ["lang", "source", "n_chars"]
    state = profile_state_init(base, columns=cols)
    print(f"state rows after init: {state.count()} "
          "(one per partition x column)")

    # snapshot 2 arrives: only its partitions are re-aggregated; the rest
    # of the state passes through by anti-join
    state = profile_apply_incremental(state, delta, columns=cols)

    print("global profile from the merged state:")
    for r in profile_from_state(state).orderBy("column").collect():
        print(f"  {r['column']}: rows={r['n_rows']} nulls={r['null_count']}"
              f" distinct~{r['distinct_approx']}"
              f" min={r['min_num'] if r['min_num'] is not None else r['min_str']}"
              f" max={r['max_num'] if r['max_num'] is not None else r['max_str']}")

    lineage = profile_from_state(state, per_partition=True)
    print(f"per-partition lineage rows: {lineage.count()}")

    # equivalence sanity: the incremental chain matches a full recompute
    full = profile_from_state(
        profile_state_init(docs, columns=cols)
    )
    inc = profile_from_state(state)
    exact_cols = ["column", "n_rows", "null_count", "empty_count",
                  "count_values", "min_num", "max_num", "sum_num",
                  "min_str", "max_str"]
    same = sorted(map(tuple, inc.select(*exact_cols).collect())) == sorted(
        map(tuple, full.select(*exact_cols).collect())
    )
    print(f"incremental == full recompute on exact fields: {same}")

    # the histogram state rides the same snapshot chain (exact counts, so
    # incremental == full bit-for-bit) and answers the drift question
    # between partition snapshots WITHOUT re-reading any raw rows
    specs = {"n_chars": 200.0}
    hist = hist_state_init(base, specs)
    hist = hist_apply_incremental(hist, delta, specs)
    print("drift verdicts from the maintained histogram state:")
    for r in (
        drift_from_state(hist, "n_chars", ks_threshold=0.1)
        .orderBy("partition").limit(5).collect()
    ):
        print(f"  part={r['partition']}: ks={r['ks_stat']:.4f} "
              f"chi2={r['chi2_stat']:.2f} drifted={r['drifted']}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-incremental-profile"))
