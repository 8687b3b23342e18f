"""Multimodal media plumbing — the pipeline-mandate pattern: image/audio/
video as opaque binary columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

Two tiers, both exercised here:

- REAL stdlib decode (``use_stub=False``) over uncompressed formats:
  Netpbm rasters (P1-P6), 8/16-bit PCM WAVE, and concatenated
  binary-Netpbm streams as the video container — header parse, pixel/
  sample decode, feature pooling and frame sampling all real.
- Deterministic stub (default) for opaque fixture payloads — same
  schemas, batching and partitioning; the shape compressed-codec kernels
  (PIL/torchaudio, absent in this container) would plug into."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from desbordante_spark.functions.media import (
    decode_media_metadata,
    extract_media_features,
    sample_video_frames,
)
from desbordante_spark.sources.interleaved import generate_media_catalog


def _pgm(width: int, height: int, shade: int) -> bytes:
    return f"P5 {width} {height} 255 ".encode() + bytes(
        [shade] * (width * height)
    )


def _wav(rate: int, samples: list[int]) -> bytes:
    body = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    data = struct.pack("<4sI", b"data", len(body)) + body
    riff = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(riff)) + riff


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    # ---- tier 1: REAL decode of uncompressed payloads ------------------
    real = spark.createDataFrame(
        [
            ("img:gray", "image", _pgm(16, 9, 64)),
            ("aud:tone", "audio", _wav(8000, [12000, -12000] * 400)),
            ("vid:clip", "video", b"".join(_pgm(4, 4, v) for v in
                                           (0, 60, 120, 180, 240))),
        ],
        "media_ref string, media_kind string, payload binary",
    )
    meta = decode_media_metadata(real, use_stub=False).collect()
    print("real metadata:", [(r["media_ref"], r["width"], r["height"],
                              r["duration_ms"]) for r in meta])
    feats = extract_media_features(
        real.filter(F.col("media_kind") != "video"), dim=4, use_stub=False
    ).collect()
    for r in feats:
        print(f"real features: {r['media_ref']} -> "
              f"{[round(v, 3) for v in r['features']]}")
    frames = sample_video_frames(
        real.filter(F.col("media_kind") == "video"),
        n_frames=3, use_stub=False,
    ).collect()
    print("real frames:", [(r["media_ref"], r["frame_idx"],
                            len(bytes(r["frame"]))) for r in frames])

    # ---- tier 2: stub over opaque catalog payloads ----------------------
    catalog = generate_media_catalog(spark, 200)
    media = catalog.withColumn(
        "payload", F.encode(F.concat(F.lit("blob:"), F.col("media_ref")),
                            "UTF-8")
    )
    m = decode_media_metadata(media, bytes_col="payload").limit(3).collect()
    print("stub metadata:", [(r["media_ref"], r["media_kind"], r["width"],
                              r["height"], r["duration_ms"]) for r in m])
    f = extract_media_features(media, bytes_col="payload", dim=8).first()
    print(f"stub features: {f['media_ref']} -> "
          f"{len(f['features'])}-dim vector")
    videos = media.filter(F.col("media_kind") == "video")
    per_ref = (
        sample_video_frames(videos, bytes_col="payload", n_frames=3)
        .groupBy("media_ref").count().first()
    )
    print(f"stub frame sampling: {per_ref['media_ref']} -> "
          f"{per_ref['count']} frames")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-media"))
