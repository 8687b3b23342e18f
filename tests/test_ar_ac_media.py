"""Association rules (FPGrowth), algebraic constraints, multimodal stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from desbordante_spark.functions.media import (
    decode_media_metadata,
    extract_media_features,
    sample_video_frames,
)
from desbordante_spark.operators.ac import ac_verify
from desbordante_spark.operators.ar import (
    mine_association_rules,
    transactions_from,
)


def test_association_rules_singular(spark):
    rows = []
    for t in range(20):
        rows += [(t, "bread"), (t, "butter")]
        if t % 2 == 0:
            rows.append((t, "milk"))
    rows.append((20, "milk"))
    df = spark.createDataFrame(rows, "tid long, item string")
    tx = transactions_from(df, "singular", "tid", "item")
    assert tx.count() == 21
    rules = mine_association_rules(tx, min_support=0.3, min_confidence=0.8)
    got = {
        (tuple(sorted(r["antecedent"])), tuple(r["consequent"])): r["confidence"]
        for r in rules.collect()
    }
    # bread -> butter holds with confidence 1.0 (all 20 bread carts)
    assert got[(("bread",), ("butter",))] == pytest.approx(1.0)
    assert got[(("milk",), ("bread",))] == pytest.approx(10 / 11)


def test_transactions_tabular(spark):
    df = spark.createDataFrame(
        [(1, "a", "b"), (2, "a", None)], "tid long, x string, y string"
    )
    tx = {r["tid"]: sorted(r["items"]) for r in
          transactions_from(df, "tabular", "tid").collect()}
    assert tx == {1: ["a", "b"], 2: ["a"]}


def test_ac_ranges_and_exceptions(spark):
    from desbordante_spark.operators.ac import ac_build_ranges, ac_exceptions

    clean = spark.createDataFrame(
        [(float(100 + i % 7), 2.0) for i in range(300)], "a double, b double"
    )
    ranges = ac_build_ranges(clean, "a", "b", op="/", sample_fraction=0.5,
                             weight=0.2)
    # values 50.0..53.0 cluster into one range at weight 0.2
    assert len(ranges) == 1
    lo, hi = ranges[0]
    assert 50.0 <= lo <= hi <= 53.0
    dirty = clean.union(
        spark.createDataFrame([(1e9, 1.0), (-1e9, 1.0)], "a double, b double")
    )
    exc = ac_exceptions(dirty, "a", "b", "/", ranges).collect()
    assert {r["a"] for r in exc} == {1e9, -1e9}


def test_ac_verify_clean(spark):
    clean = spark.createDataFrame(
        [(float(100 + i % 7), 2.0) for i in range(300)], "a double, b double"
    )
    res = ac_verify(clean, "a", "b", op="/", sample_fraction=0.6, weight=0.2)
    assert res["total_rows"] == 300
    # the sample covers every one of the 7 distinct ratio values at this
    # fraction with overwhelming probability -> no exceptions
    assert res["num_exceptions"] == 0
    assert res["exception_fraction"] == 0.0


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("m1", "image", bytearray(b"imgpayload-1")),
        ("m2", "audio", bytearray(b"audiopayload-2")),
        ("m3", "video", bytearray(b"videopayload-3")),
    ]
    return spark.createDataFrame(
        rows, "media_ref string, media_kind string, payload binary"
    )


def test_media_metadata_stub(media_df):
    out = {r["media_ref"]: r for r in decode_media_metadata(media_df).collect()}
    assert out["m1"]["byte_len"] == len(b"imgpayload-1")
    assert out["m1"]["duration_ms"] == 0  # images have no duration
    assert out["m2"]["duration_ms"] > 0
    assert out["m1"]["width"] >= 160 and out["m1"]["height"] >= 120
    # determinism
    again = {r["media_ref"]: r for r in decode_media_metadata(media_df).collect()}
    assert out["m1"] == again["m1"]


def test_media_features_stub(media_df):
    rows = {r["media_ref"]: r["features"] for r in
            extract_media_features(media_df, dim=8).collect()}
    assert all(len(v) == 8 for v in rows.values())
    assert all(0.0 <= x <= 1.0 for v in rows.values() for x in v)
    assert rows["m1"] != rows["m2"]


def test_video_frame_sampling_stub(media_df):
    frames = sample_video_frames(media_df.filter("media_kind = 'video'"),
                                 n_frames=3).collect()
    assert len(frames) == 3
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2]
    assert all(len(bytes(r["frame"])) == 16 for r in frames)
