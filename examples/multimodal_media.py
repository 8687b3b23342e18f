"""Multimodal media plumbing — the pipeline-mandate pattern: image/audio/
video as opaque binary columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages (decode kernels are deterministic stubs
here — the container has no codec libraries — but the schemas, batching and
partitioning are the real production shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from desbordante_spark.functions.media import (
    decode_media_metadata,
    extract_media_features,
    sample_video_frames,
)
from desbordante_spark.sources.interleaved import generate_media_catalog


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    catalog = generate_media_catalog(spark, 200)
    # attach an opaque binary payload column (deterministic fake bytes)
    media = catalog.withColumn(
        "payload", F.encode(F.concat(F.lit("blob:"), F.col("media_ref")),
                            "UTF-8")
    )
    meta = decode_media_metadata(media, bytes_col="payload")
    m = meta.limit(3).collect()
    print("metadata:", [(r["media_ref"], r["media_kind"], r["width"],
                         r["height"], r["duration_ms"]) for r in m])

    feats = extract_media_features(media, bytes_col="payload", dim=8)
    f = feats.first()
    print(f"features: {f['media_ref']} -> {len(f['features'])}-dim vector")

    videos = media.filter(F.col("media_kind") == "video")
    frames = sample_video_frames(videos, bytes_col="payload", n_frames=3)
    per_ref = frames.groupBy("media_ref").count().first()
    print(f"frame sampling: {per_ref['media_ref']} -> "
          f"{per_ref['count']} frames")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-media"))
