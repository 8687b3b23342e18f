"""Streaming ≡ batch equivalence gates (VERDICT r4 #7).

Each test drives a streaming pipeline over a staged MICRO-BATCH SEQUENCE
(file source, one file per trigger, pinned mtimes for deterministic batch
order) and asserts the FINAL streaming state equals the corresponding
BATCH operator's answer on the union of all micro-batches — the explicit
correctness contract for the streaming extension: stateful streaming is
an incremental evaluation of the same constraint, so replaying the whole
input through the batch operator must give the same verdicts.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

SCHEMA = "doc_id string, ts timestamp, v double"


def _stage_batches(tmp_path, name, batches):
    src = tmp_path / name
    src.mkdir()
    for i, rows in enumerate(batches):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # file source orders batches by mtime — pin strictly increasing
        os.utime(p, (1000000000 + i * 1000, 1000000000 + i * 1000))
    return src


def _run_stream(spark, src, build, name, mode, schema=SCHEMA):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_dedup_equals_batch_union(spark, tmp_path):
    """Final first-seen-dedup state == exact-dedup groupBy on the union:
    per key, last dup_count = total occurrences - 1; duplicate-alert keys
    = the batch UCC violation keys."""
    from desbordante_spark.operators.ucc import ucc_violations
    from desbordante_spark.streaming.stream_verify import (
        streaming_duplicate_alerts,
        streaming_first_seen_dedup,
    )

    # duplicates within one batch (a, a), across batches (a, b), and
    # singletons (c, d)
    batches = [
        [
            {"doc_id": "a", "ts": "2026-01-01T00:00:00", "v": 1.0},
            {"doc_id": "a", "ts": "2026-01-01T00:00:01", "v": 2.0},
            {"doc_id": "b", "ts": "2026-01-01T00:00:02", "v": 3.0},
        ],
        [
            {"doc_id": "b", "ts": "2026-01-01T00:10:00", "v": 4.0},
            {"doc_id": "c", "ts": "2026-01-01T00:10:01", "v": 5.0},
        ],
        [
            {"doc_id": "a", "ts": "2026-01-01T00:20:00", "v": 6.0},
            {"doc_id": "d", "ts": "2026-01-01T00:20:01", "v": 7.0},
        ],
    ]
    src = _stage_batches(tmp_path, "dedup_eq", batches)

    out = _run_stream(
        spark, src,
        lambda s: streaming_first_seen_dedup(
            s, "doc_id", "ts", watermark="1 hour"
        ),
        "dedup_eq_fs", "update",
    ).collect()
    # final state per key = the row with the highest running dup_count
    final: dict[str, int] = {}
    first_seen_keys = set()
    for r in out:
        final[r["doc_id"]] = max(final.get(r["doc_id"], 0), r["dup_count"])
        if r["first_seen"] == 1:
            first_seen_keys.add(r["doc_id"])

    union = spark.read.schema(SCHEMA).json(str(src))
    batch_counts = {
        r["doc_id"]: r["n"]
        for r in union.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert final == {k: n - 1 for k, n in batch_counts.items()}
    assert first_seen_keys == set(batch_counts)  # each key emitted once new

    alerts = _run_stream(
        spark, src,
        lambda s: streaming_duplicate_alerts(s, ["doc_id"]),
        "dedup_eq_alerts", "update",
    ).collect()
    final_cnt: dict[str, int] = {}
    for r in alerts:
        final_cnt[r["doc_id"]] = max(final_cnt.get(r["doc_id"], 0), r["cnt"])
    # batch operator on the union: UCC violation clusters = duplicate keys
    # (one row per duplicate key with its cluster size)
    viol = ucc_violations(union, ["doc_id"])
    batch_dupes = {r["doc_id"]: r["cnt"] for r in viol.collect()}
    assert final_cnt == batch_dupes
    assert final_cnt == {k: n for k, n in batch_counts.items() if n > 1}


def test_streaming_referential_equals_batch_union(spark, tmp_path):
    """Union of all streamed referential alerts == the batch anti-join
    (ind_missing_values) on the union of micro-batches: same missing keys,
    same per-key row support."""
    from desbordante_spark.operators.ind import ind_missing_values
    from desbordante_spark.streaming.stream_verify import (
        streaming_referential_alerts,
    )

    batches = [
        [
            {"doc_id": "m1", "ts": "2026-01-01T00:00:00", "v": 1.0},
            {"doc_id": "mX", "ts": "2026-01-01T00:00:01", "v": 2.0},
            {"doc_id": None, "ts": "2026-01-01T00:00:02", "v": 3.0},
        ],
        [
            {"doc_id": "m2", "ts": "2026-01-01T00:10:00", "v": 4.0},
            {"doc_id": "mX", "ts": "2026-01-01T00:10:01", "v": 5.0},
            {"doc_id": "mY", "ts": "2026-01-01T00:10:02", "v": 6.0},
        ],
    ]
    src = _stage_batches(tmp_path, "ref_eq", batches)
    dim = spark.createDataFrame(
        [("m1",), ("m2",), ("m3",)], "media_ref string"
    )

    alerts = _run_stream(
        spark, src,
        lambda s: streaming_referential_alerts(
            s, ["doc_id"], dim, ["media_ref"]
        ),
        "ref_eq_alerts", "append",
    ).collect()
    stream_missing: dict[str, int] = {}
    for r in alerts:
        stream_missing[r["doc_id"]] = stream_missing.get(r["doc_id"], 0) + 1

    union = spark.read.schema(SCHEMA).json(str(src))
    batch_missing = {
        r["doc_id"]: r["ref_count"]
        for r in ind_missing_values(
            union, ["doc_id"], dim, ["media_ref"]
        ).collect()
    }
    assert stream_missing == batch_missing
    assert stream_missing == {"mX": 2, "mY": 1}  # NULL FK skipped both sides


SPAN_SCHEMA = (
    "doc_id string, ts timestamp, spans array<struct<kind:string,"
    "text:string,media_ref:string,offset:int>>"
)


def test_streaming_span_invariant_equals_batch_union(spark, tmp_path):
    """The span invariant is stateless/row-local: the union of streamed
    violation rows must equal the batch operator's on the unioned input,
    reason-for-reason."""
    from desbordante_spark.operators.span_invariant import (
        span_wellformed_violations,
    )
    from desbordante_spark.streaming.stream_verify import (
        streaming_span_invariant,
    )

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    batches = [
        [
            {"doc_id": "ok1", "ts": "2026-01-01T00:00:00",
             "spans": [span("text", "hi", None, 0),
                       span("image", "", "m1", 1)]},
            {"doc_id": "bad_offset", "ts": "2026-01-01T00:00:01",
             "spans": [span("text", "a", None, 1)]},
        ],
        [
            {"doc_id": "bad_kind_and_ref", "ts": "2026-01-01T00:10:00",
             "spans": [span("gif", "", None, 0)]},
            {"doc_id": "bad_text", "ts": "2026-01-01T00:10:01",
             "spans": [span("text", "", None, 0)]},
        ],
    ]
    src = _stage_batches(tmp_path, "span_eq", batches)

    streamed = {
        r["doc_id"]: sorted(r["reasons"])
        for r in _run_stream(
            spark, src,
            lambda s: streaming_span_invariant(s),
            "span_eq_alerts", "append",
            schema=SPAN_SCHEMA,
        ).collect()
    }
    union = spark.read.schema(SPAN_SCHEMA).json(str(src))
    batch = {
        r["doc_id"]: sorted(r["reasons"])
        for r in span_wellformed_violations(union).collect()
    }
    assert streamed == batch
    assert set(streamed) == {"bad_offset", "bad_kind_and_ref", "bad_text"}
    assert "ok1" not in streamed


def test_streaming_profile_equals_batch_union(spark, tmp_path):
    """Finalized streaming profile windows == the same windowed aggregate
    on the union (count/nulls/min/max/avg and the HLL distinct — register
    merges are order-independent, so incremental == batch)."""
    from desbordante_spark.streaming.stream_verify import streaming_profile

    batches = [
        [{"doc_id": f"a{i}", "ts": f"2026-01-01T00:00:{i:02d}",
          "v": float(i % 5) if i % 7 else None} for i in range(20)],
        [{"doc_id": f"b{i}", "ts": f"2026-01-01T00:01:{i:02d}",
          "v": 10.0 + i % 3} for i in range(12)],
        # flush batch: advances the watermark so windows 1-2 finalize
        [{"doc_id": "late", "ts": "2026-01-01T01:00:00", "v": 1.0}],
    ]
    src = _stage_batches(tmp_path, "prof_eq", batches)

    streamed_rows = _run_stream(
        spark, src,
        lambda s: streaming_profile(
            s, "v", "ts", window="1 minute", watermark="5 seconds"
        ),
        "prof_eq_out", "append",
    ).collect()
    streamed = {
        str(r["window"]["start"]): (
            r["count_values"], r["null_count"], r["min_value"],
            r["max_value"], round(r["avg_value"], 9), r["approx_distinct"],
        )
        for r in streamed_rows
    }

    union = spark.read.schema(SCHEMA).json(str(src))
    finalized = union.filter(F.col("ts") < "2026-01-01T00:02:00")
    v = F.col("v")
    batch = {
        str(r["window"]["start"]): (
            r["count_values"], r["null_count"], r["min_value"],
            r["max_value"], round(r["avg_value"], 9), r["approx_distinct"],
        )
        for r in finalized.groupBy(
            F.window(F.col("ts"), "1 minute").alias("window")
        ).agg(
            F.count(v).alias("count_values"),
            F.sum(v.isNull().cast("long")).alias("null_count"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
            F.avg(v.cast("double")).alias("avg_value"),
            F.approx_count_distinct(v).alias("approx_distinct"),
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) == 2  # both data windows finalized


def test_streaming_drift_equals_batch_union(spark, tmp_path):
    """Finalized streaming histogram windows == the batch histogram_sketch
    of the union (per window-partition), and batch drift_metrics over
    either sketch yields identical verdicts."""
    from desbordante_spark.operators.drift import drift_metrics, histogram_sketch
    from desbordante_spark.streaming.stream_verify import (
        streaming_histogram_sketch,
    )

    batches = [
        [{"doc_id": f"a{i}", "ts": f"2026-01-01T00:00:{i:02d}",
          "v": float(i % 4)} for i in range(16)],
        [{"doc_id": f"b{i}", "ts": f"2026-01-01T00:01:{i:02d}",
          "v": 30.0 + i % 4} for i in range(16)],
        # flush batch: only advances the watermark so windows 1-2 finalize
        [{"doc_id": "late", "ts": "2026-01-01T01:00:00", "v": 1.0}],
    ]
    src = _stage_batches(tmp_path, "drift_eq", batches)
    sketch_rows = _run_stream(
        spark, src,
        lambda s: streaming_histogram_sketch(
            s, "v", "ts", window="1 minute", watermark="5 seconds",
            bucket_width=1.0,
        ),
        "drift_eq_sketch", "append",
    ).collect()
    stream_sketch = {
        (str(r["window_start"]), r["bucket"]): r["cnt"] for r in sketch_rows
    }

    union = spark.read.schema(SCHEMA).json(str(src))
    finalized = union.filter(F.col("ts") < "2026-01-01T00:02:00")
    batch = histogram_sketch(
        finalized.withColumn(
            "win", F.window(F.col("ts"), "1 minute").start.cast("string")
        ),
        "v", "win", bucket_width=1.0,
    ).collect()
    batch_sketch = {(r["partition"], r["bucket"]): r["cnt"] for r in batch}
    assert stream_sketch == batch_sketch

    # identical drift verdicts from either sketch, same batch machinery
    def verdicts(pairs):
        rows = [(p, b, int(c)) for (p, b), c in pairs.items()] + [
            ("__baseline__", str(b), 4) for b in range(4)
        ]
        sk = spark.createDataFrame(rows, "partition string, bucket string, cnt long")
        out = drift_metrics(sk, baseline_partition="__baseline__",
                            ks_threshold=0.3)
        return {r["partition"]: r["drifted"] for r in out.collect()}

    vs = verdicts(stream_sketch)
    vb = verdicts(batch_sketch)
    assert vs == vb
    assert sum(vs.values()) == 1  # exactly the shifted window drifted
