"""Snapshot-delta incremental verify vs full recompute at bench scale.

VERDICT r5 #8: wire the Iceberg snapshot layer (sources/iceberg.py) to the
dynamic verifier and show the speedup of snapshot-to-snapshot incremental
recompute over re-aggregating the whole table per snapshot.

The north rule asks for PER-PARTITION pass/fail with per-partition lineage —
and that is also what makes incremental verification scale: an Iceberg
snapshot's appended files land in a few partitions, so only those
partitions' verdicts can change. Protocol (hive-partitioned parquet stands
in for the Iceberg table/state — no jars in this container; from
``read_incremental``'s output onward the verify path is identical):

1. stage an N-doc interleaved table (default 8M, 16 part_keys) and write
   the per-partition doc_id uniqueness state ``(doc_id, cnt)`` partitioned
   by part_key (timed once as ``state_init``), with carried per-partition
   verdict totals — the checkpoint's "metrics rows";
2. for each of K append snapshots (20k docs landing in 2 of 16+1
   partitions — the realistic write pattern):
   - **full**: re-aggregate ``ucc_metrics_df(by=part_key)`` over base ∪
     all deltas so far (snapshot-unaware engines re-verify everything);
   - **incremental**: for each TOUCHED partition only — a
     partition-PRUNED state read (the scan never touches the other 15
     partitions' files), ``ucc_apply_incremental``, verdict from carried
     totals, and a partition-scoped state write-back (Iceberg's
     partition-level commit). Untouched partitions' verdict rows carry
     over from the checkpoint.
   - per-partition verdicts must MATCH between the paths (hard assert).

Run SOLO: ``python tools/incremental_bench.py [n_docs]`` → prints one JSON
line and writes BENCH_INCREMENTAL.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_TKEYS = (
    "total_rows", "num_violating_clusters", "num_violating_rows", "conflicts",
)


def _contrib_by_part(state) -> dict[str, dict[str, int]]:
    """Per-partition verdict scalars from a (part_key, doc_id, cnt) slice —
    one tiny aggregation (the slice is delta-sized)."""
    rows = state.groupBy("part_key").agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("total_rows"),
        F.coalesce(F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)), F.lit(0))
        .alias("num_violating_clusters"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)),
            F.lit(0),
        ).alias("num_violating_rows"),
        F.coalesce(F.sum(F.col("cnt") * (F.col("cnt") - 1)), F.lit(0))
        .alias("conflicts"),
    ).collect()
    return {r["part_key"]: {k: int(r[k]) for k in _TKEYS} for r in rows}


def main() -> None:
    from desbordante_spark.operators.dynamic import (
        metrics_row_from_totals,
        ucc_state_init,
    )
    from desbordante_spark.operators.ucc import ucc_metrics_df
    from desbordante_spark.session import get_spark
    from desbordante_spark.sources.interleaved import generate_documents

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_batches = int(os.environ.get("SPARK_GRAFT_INC_BATCHES", "3"))
    batch_size = int(os.environ.get("SPARK_GRAFT_INC_BATCH", "20000"))

    spark = get_spark(
        app_name="incremental-bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    stage = tempfile.mkdtemp(prefix="inc_bench_")
    try:
        # ---- stage the base snapshot (docs parquet) ----
        docs_path = f"{stage}/documents"
        # 64 table partitions: partition-pruned incremental reads scale
        # with partition granularity (at 10^12 scale a snapshot touches a
        # handful of thousands of partitions — the pruning ratio only
        # improves)
        (
            generate_documents(spark, n_docs, n_partitions=64,
                               n_part_keys=64)
            # n_spans feeds the drift section below; Parquet column pruning
            # keeps the UCC scans unaffected by the extra column
            .select("doc_id", "part_key",
                    F.size("spans").alias("n_spans"))
            .write.mode("overwrite").parquet(docs_path)
        )
        base = spark.read.parquet(docs_path)
        part_keys = [r["part_key"] for r in
                     base.select("part_key").distinct().collect()]

        # ---- init: per-partition state (hive-partitioned) + totals ----
        t = time.monotonic()
        state_path = f"{stage}/state"
        (
            ucc_state_init(base, ["part_key", "doc_id"])
            .write.mode("overwrite").partitionBy("part_key")
            .parquet(state_path)
        )
        totals_by_part = _contrib_by_part(spark.read.parquet(state_path))
        state_init_sec = time.monotonic() - t

        # ---- K append snapshots: each lands in 2 partitions ----
        deltas = []
        touched_parts: list[list[str]] = []
        for b in range(n_batches):
            hot = part_keys[b % len(part_keys)]
            touched_parts.append(["pNEW", hot])
            fresh = spark.range(batch_size - 500).select(
                F.concat(F.lit(f"new{b}_"), F.col("id").cast("string"))
                .alias("doc_id"),
                F.lit("pNEW").alias("part_key"),
                ((F.col("id") % 16) + 1).cast("int").alias("n_spans"),
            )
            dupes = spark.range(500).select(
                F.concat(
                    F.lit("doc_"),
                    ((F.col("id") * 7919 + b) % n_docs).cast("string"),
                ).alias("doc_id"),
                F.lit(hot).alias("part_key"),
                ((F.col("id") % 16) + 1).cast("int").alias("n_spans"),
            )
            p = f"{stage}/delta_{b}"
            fresh.unionByName(dupes).coalesce(2).write.mode(
                "overwrite"
            ).parquet(p)
            deltas.append(spark.read.parquet(p))
            if "pNEW" not in totals_by_part:
                totals_by_part["pNEW"] = {
                    "total_rows": 0, "num_violating_clusters": 0,
                    "num_violating_rows": 0, "conflicts": 0,
                }

        # warmup: one untimed full pass so batch 1's full recompute isn't
        # penalized by a cold page cache relative to later batches
        ucc_metrics_df(base, ["doc_id"], by=["part_key"]).collect()

        full_secs, inc_secs = [], []
        cur = base
        for b in range(n_batches):
            cur = cur.unionByName(deltas[b])

            # ---------- full recompute (snapshot-unaware) ----------
            t = time.monotonic()
            full_rows = {
                r["part_key"]: {
                    k: r[k] for k in (
                        "total_rows", "num_violating_clusters",
                        "num_violating_rows", "error", "holds",
                    )
                }
                for r in ucc_metrics_df(
                    cur, ["doc_id"], by=["part_key"]
                ).collect()
            }
            full_secs.append(time.monotonic() - t)

            # ---------- incremental: touched partitions only ----------
            # (touched partition list comes from the snapshot's manifest
            # in Iceberg — free metadata, so it's known outside the timing)
            touched = touched_parts[b]
            t = time.monotonic()
            # ONE partition-pruned state read covers every touched
            # partition; the other partitions' files are never opened
            slice_df = spark.read.parquet(state_path).filter(
                F.col("part_key").isin(touched)
            )
            delta_keys = deltas[b].select("part_key", "doc_id").distinct()
            old_touched = slice_df.join(
                F.broadcast(delta_keys), ["part_key", "doc_id"], "left_semi"
            ).localCheckpoint(eager=True)
            old_c = _contrib_by_part(old_touched)
            from desbordante_spark.operators.dynamic import state_apply

            new_touched = state_apply(
                old_touched, ["part_key", "doc_id"],
                inserts=deltas[b],
            ).localCheckpoint(eager=True)
            new_c = _contrib_by_part(new_touched)
            for p in touched:
                zero = {"total_rows": 0, "num_violating_clusters": 0,
                        "num_violating_rows": 0, "conflicts": 0}
                o, nn = old_c.get(p, zero), new_c.get(p, zero)
                totals_by_part[p] = {
                    k: totals_by_part[p][k] - o[k] + nn[k]
                    for k in totals_by_part[p]
                }
            # partition-scoped write-back = Iceberg's copy-on-write commit:
            # the touched partitions' new state files are written ONCE to a
            # staging dir, then swapped in with filesystem renames — no
            # second materialization pass, untouched partitions' files are
            # never rewritten
            new_slices = slice_df.join(
                F.broadcast(delta_keys), ["part_key", "doc_id"], "left_anti"
            ).unionByName(new_touched)
            commit_dir = f"{stage}/state_commit_{b}"
            new_slices.write.partitionBy("part_key").parquet(commit_dir)
            for p in touched:
                dst = f"{state_path}/part_key={p}"
                src = f"{commit_dir}/part_key={p}"
                shutil.rmtree(dst, ignore_errors=True)
                if os.path.isdir(src):
                    os.rename(src, dst)
            inc_rows = {
                p: metrics_row_from_totals(tt)
                for p, tt in totals_by_part.items()
            }
            inc_secs.append(time.monotonic() - t)

            assert inc_rows == full_rows, (
                b,
                {p: (inc_rows.get(p), full_rows.get(p))
                 for p in set(inc_rows) | set(full_rows)
                 if inc_rows.get(p) != full_rows.get(p)},
            )

        # ================= drift-from-state vs full drift =================
        # Same snapshots, the distribution question: full recompute builds
        # the histogram over base ∪ deltas every snapshot (linear in table
        # size); the state path folds ONLY the delta into the mergeable
        # histogram state (exact counts — incremental ≡ full bit-for-bit)
        # and runs KS/chi² on the state, which is |partitions| × |buckets|
        # rows (~1k) — effectively free. Verdicts must match exactly.
        from desbordante_spark.operators.drift import (
            drift_metrics,
            histogram_sketch,
        )
        from desbordante_spark.operators.profile_state import (
            drift_from_state,
            hist_apply_incremental,
            hist_state_init,
        )

        specs = {"n_spans": 1.0}
        t = time.monotonic()
        hist = hist_state_init(base, specs).localCheckpoint(eager=True)
        drift_state_init_sec = time.monotonic() - t

        def _verdicts(df):
            return sorted(map(tuple, df.collect()))

        # warmup for the same page-cache reason as the UCC section
        drift_metrics(
            histogram_sketch(base, "n_spans", "part_key", bucket_width=1.0)
        ).collect()

        drift_full_secs, drift_inc_secs = [], []
        cur = base
        for b in range(n_batches):
            cur = cur.unionByName(deltas[b])
            t = time.monotonic()
            full_v = _verdicts(
                drift_metrics(
                    histogram_sketch(
                        cur, "n_spans", "part_key", bucket_width=1.0
                    )
                )
            )
            drift_full_secs.append(time.monotonic() - t)

            t = time.monotonic()
            hist = hist_apply_incremental(
                hist, deltas[b], specs
            ).localCheckpoint(eager=True)
            inc_v = _verdicts(drift_from_state(hist, "n_spans"))
            drift_inc_secs.append(time.monotonic() - t)
            assert inc_v == full_v, (b, inc_v[:3], full_v[:3])

        out = {
            "metric": "incremental_vs_full_verify",
            "n_docs": n_docs,
            "n_batches": n_batches,
            "batch_size": batch_size,
            "n_partitions": len(part_keys) + 1,
            "touched_partitions_per_batch": 2,
            "state_init_sec": round(state_init_sec, 3),
            "full_recompute_sec": [round(x, 3) for x in full_secs],
            "incremental_sec": [round(x, 3) for x in inc_secs],
            "speedup": round(sum(full_secs) / max(sum(inc_secs), 1e-9), 2),
            "verdicts_match": True,
            "drift": {
                "state_init_sec": round(drift_state_init_sec, 3),
                "full_recompute_sec": [round(x, 3) for x in drift_full_secs],
                "incremental_sec": [round(x, 3) for x in drift_inc_secs],
                "speedup": round(
                    sum(drift_full_secs) / max(sum(drift_inc_secs), 1e-9), 2
                ),
                "verdicts_match": True,
            },
        }
        print(json.dumps(out))
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BENCH_INCREMENTAL.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
