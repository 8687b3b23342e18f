"""Structured-Streaming verification: duplicate alerts and windowed profile
driven end-to-end with a file source + memory sink."""

from __future__ import annotations

import json

import pytest

from desbordante_spark.streaming.stream_verify import (
    streaming_duplicate_alerts,
    streaming_profile,
    streaming_span_invariant,
)


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"doc_id": "a", "ts": "2026-01-01T00:00:00", "v": 1.0},
        {"doc_id": "b", "ts": "2026-01-01T00:00:10", "v": 2.0},
        {"doc_id": "a", "ts": "2026-01-01T00:00:20", "v": 3.0},
        {"doc_id": "c", "ts": "2026-01-01T00:00:30", "v": 4.0},
        {"doc_id": "a", "ts": "2026-01-01T00:00:40", "v": 5.0},
    ]
    with open(src / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("doc_id string, ts timestamp, v double")
        .json(str(src))
    )
    return stream


def _run(q_df, name, output_mode):
    q = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_duplicate_alerts(spark, stream_env):
    alerts = streaming_duplicate_alerts(stream_env, ["doc_id"])
    _run(alerts, "dup_alerts", "update")
    rows = spark.sql("SELECT * FROM dup_alerts").collect()
    got = {(r["doc_id"], r["cnt"]) for r in rows}
    assert ("a", 3) in got
    assert not any(d == "b" for d, _ in got)


def test_streaming_profile(spark, stream_env):
    prof = streaming_profile(stream_env, "v", "ts", window="1 minute")
    # complete mode: a finite test source never advances the watermark past
    # the window end, so append would hold the row back forever
    _run(prof, "stream_prof", "complete")
    rows = spark.sql("SELECT * FROM stream_prof").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["count_values"] == 5
    assert r["min_value"] == 1.0 and r["max_value"] == 5.0
    assert r["avg_value"] == pytest.approx(3.0)


def test_streaming_span_invariant(spark, tmp_path):
    src = tmp_path / "spans"
    src.mkdir()
    docs = [
        {"doc_id": "ok", "spans": [
            {"kind": "text", "text": "hi", "media_ref": None, "offset": 0}]},
        {"doc_id": "bad", "spans": [
            {"kind": "text", "text": "", "media_ref": None, "offset": 0}]},
    ]
    with open(src / "b.json", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    stream = spark.readStream.schema(schema).json(str(src))
    viol = streaming_span_invariant(stream)
    _run(viol, "span_viol", "append")
    rows = spark.sql("SELECT * FROM span_viol").collect()
    assert [r["doc_id"] for r in rows] == ["bad"]
    assert list(rows[0]["reasons"]) == ["text_presence"]


def test_streaming_first_seen_dedup(spark, stream_env):
    from desbordante_spark.streaming.stream_verify import (
        streaming_first_seen_dedup,
    )

    out = streaming_first_seen_dedup(stream_env, "doc_id", "ts")
    _run(out, "first_seen", "update")
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM first_seen").collect()}
    assert rows["a"]["first_seen"] == 1 and rows["a"]["dup_count"] == 2
    assert rows["b"]["first_seen"] == 1 and rows["b"]["dup_count"] == 0
    assert rows["c"]["dup_count"] == 0


def test_streaming_first_seen_timeout_frees_state(spark, tmp_path):
    # three micro-batches (one file each): key "old" must time out once the
    # watermark passes its timeout — and the timeout invocation must emit
    # NOTHING (pre-fix it emitted a phantom duplicate row and re-registered
    # state forever)
    from desbordante_spark.streaming.stream_verify import (
        streaming_first_seen_dedup,
    )

    src = tmp_path / "tm"
    src.mkdir()
    batches = [
        [{"doc_id": "old", "ts": "2026-01-01T00:00:00", "v": 1.0}],
        [{"doc_id": "new1", "ts": "2026-01-01T03:00:00", "v": 2.0}],
        [{"doc_id": "new2", "ts": "2026-01-01T06:00:00", "v": 3.0}],
    ]
    import os

    for i, rows in enumerate(batches):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # the file source orders batches by modification time — pin strictly
        # increasing mtimes so batch order (and thus watermark advancement)
        # is deterministic
        os.utime(p, (1000000000 + i * 1000, 1000000000 + i * 1000))
    stream = (
        spark.readStream.schema("doc_id string, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = streaming_first_seen_dedup(stream, "doc_id", "ts")
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_tm")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM first_seen_tm").collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["doc_id"], []).append(r)
    # exactly ONE row per key — no phantom emission from the timeout path
    assert {k: len(v) for k, v in per_key.items()} == {
        "old": 1, "new1": 1, "new2": 1
    }
    assert per_key["old"][0]["first_seen"] == 1


def test_streaming_drift(spark, tmp_path):
    # window 1: values ~ baseline; window 2: shifted distribution → drift.
    # three files with pinned mtimes; the third only advances the watermark
    # so windows 1-2 finalize and reach foreachBatch
    from desbordante_spark.streaming.stream_verify import (
        drift_foreach_batch,
        streaming_histogram_sketch,
    )

    import os

    src = tmp_path / "drift"
    src.mkdir()
    batches = [
        [{"doc_id": f"a{i}", "ts": f"2026-01-01T00:00:{i:02d}", "v": float(i % 4)}
         for i in range(16)],
        [{"doc_id": f"b{i}", "ts": f"2026-01-01T00:01:{i:02d}",
          "v": 30.0 + i % 4} for i in range(16)],
        [{"doc_id": "late", "ts": "2026-01-01T01:00:00", "v": 1.0}],
    ]
    for i, rows in enumerate(batches):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (1000000000 + i * 1000, 1000000000 + i * 1000))
    stream = (
        spark.readStream.schema("doc_id string, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    sketch = streaming_histogram_sketch(
        stream, "v", "ts", window="1 minute", watermark="5 seconds",
        bucket_width=1.0,
    )
    # baseline matches window 1's distribution (uniform over buckets 0-3)
    baseline = [(str(b), 4) for b in range(4)]
    alerts: list = []
    q = (
        sketch.writeStream.outputMode("append")
        .foreachBatch(drift_foreach_batch(baseline, alerts.extend,
                                          ks_threshold=0.3))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drifted = {r["partition"] for r in alerts}
    assert any(p.endswith("00:01:00") for p in drifted)   # shifted window
    assert not any(p.endswith("00:00:00") for p in drifted)  # baseline-like


def test_streaming_referential_alerts(spark, stream_env):
    from desbordante_spark.streaming.stream_verify import (
        streaming_referential_alerts,
    )

    catalog = spark.createDataFrame(
        [("a",), ("b",)], "known_id string"
    )
    alerts = streaming_referential_alerts(
        stream_env, ["doc_id"], catalog, ["known_id"]
    )
    _run(alerts, "ref_alerts", "append")
    rows = spark.sql("SELECT * FROM ref_alerts").collect()
    assert {r["doc_id"] for r in rows} == {"c"}  # only the dangling key
