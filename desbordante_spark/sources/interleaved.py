"""Deterministic distributed generator for the interleaved-document table.

Synthesizes the BASELINE.json input_hint schema
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>, part_key
string)`` plus the media catalog (FIXTURES.md F1/F2) entirely with JVM-side
expressions over ``spark.range`` — no driver-side data, no external input, so
the same (seed, size) yields the same table at any scale and parallelism.
All pseudo-randomness derives from ``xxhash64(idx, seed, tag)``.

Injected, exactly-derivable violations:
- **Duplicate doc_ids** (UCC goldens): the first ``2*dup_pairs`` docs pair up
  — odd idx < 2*dup_pairs reuses the id of idx-1 → exactly ``dup_pairs``
  clusters of size 2.
- **Dangling media refs** (referential goldens): ~1/``dangling_rate`` of
  media spans point at ``x``-prefixed refs, which never exist in the catalog
  (catalog refs are all ``m``-prefixed).
- **Span-order violations** (span-invariant goldens): docs with
  ``idx % offset_viol_every == 7`` store reversed offsets.
- **Drift** (drift goldens): the last part_key draws span counts from a
  shifted distribution (9..16 instead of 1..16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["generate_documents", "generate_media_catalog", "SPAN_KINDS"]

SPAN_KINDS = ["text", "image", "audio", "video"]


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols)


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_part_keys: int = 16,
    n_media: int | None = None,
    dup_pairs: int | None = None,
    dangling_rate: int = 50,
    offset_viol_every: int = 997,
    drift: bool = True,
    n_partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_docs`` interleaved documents (see module docstring)."""
    if n_media is None:
        n_media = max(100, n_docs // 10)
    if dup_pairs is None:
        dup_pairs = max(1, n_docs // 1000)

    rng = (
        spark.range(0, n_docs, numPartitions=n_partitions)
        if n_partitions
        else spark.range(0, n_docs)
    )
    idx = F.col("id")
    s = F.lit(seed)

    dup_src = F.when(
        (idx < 2 * dup_pairs) & (idx % 2 == 1), idx - 1
    ).otherwise(idx)
    doc_id = F.format_string("doc%012d", dup_src)

    # partition derives from the (post-dup) doc id, so duplicate rows land in
    # the same partition — per-partition verdicts then see them (and that's
    # how a real table partitioned by key behaves)
    part_num = F.pmod(_h(dup_src, s, F.lit("part")), F.lit(n_part_keys))
    is_drift = (part_num == n_part_keys - 1) & F.lit(drift)
    n_spans = F.when(
        is_drift, F.lit(9) + F.pmod(_h(idx, s, F.lit("len2")), F.lit(8))
    ).otherwise(F.lit(1) + F.pmod(_h(idx, s, F.lit("len")), F.lit(16)))

    bad_offsets = (
        F.pmod(idx, F.lit(offset_viol_every)) == 7
        if offset_viol_every
        else F.lit(False)
    )

    def span(i):
        kind_roll = F.pmod(_h(idx, i, s, F.lit("kind")), F.lit(10))
        kind = (
            F.when(kind_roll < 7, F.lit("text"))
            .when(kind_roll == 7, F.lit("image"))
            .when(kind_roll == 8, F.lit("audio"))
            .otherwise(F.lit("video"))
        )
        n_words = F.lit(1) + F.pmod(_h(idx, i, s, F.lit("nw")), F.lit(6))
        words = F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.concat(
                F.lit("w"), F.pmod(_h(idx, i, j, s, F.lit("w")), F.lit(500))
            ),
        )
        text = F.when(kind == "text", F.concat_ws(" ", words)).otherwise(F.lit(""))
        dangling = F.pmod(_h(idx, i, s, F.lit("dang")), F.lit(dangling_rate)) == 0
        media_ref = F.when(
            kind != "text",
            F.when(
                dangling,
                F.format_string(
                    "x%08d", F.pmod(_h(idx, i, s, F.lit("xref")), F.lit(1000))
                ),
            ).otherwise(
                F.format_string(
                    "m%08d", F.pmod(_h(idx, i, s, F.lit("mref")), F.lit(n_media))
                )
            ),
        )  # NULL for text spans
        offset = F.when(bad_offsets & (n_spans > 1), n_spans - 1 - i).otherwise(i)
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.cast("int").alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    return rng.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        F.format_string("p%03d", part_num).alias("part_key"),
    )


def generate_media_catalog(
    spark: SparkSession,
    n_media: int,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """Media catalog (F2): every ``m``-prefixed ref documents can use."""
    rng = (
        spark.range(0, n_media, numPartitions=n_partitions)
        if n_partitions
        else spark.range(0, n_media)
    )
    idx = F.col("id")
    s = F.lit(seed)
    kind = F.element_at(
        F.array(*[F.lit(k) for k in ("image", "audio", "video")]),
        (F.pmod(_h(idx, s, F.lit("mk")), F.lit(3)) + 1).cast("int"),
    )
    return rng.select(
        F.format_string("m%08d", idx).alias("media_ref"),
        kind.alias("media_kind"),
        (F.lit(1024) + F.pmod(_h(idx, s, F.lit("mb")), F.lit(10_000_000))).alias(
            "bytes"
        ),
    )
