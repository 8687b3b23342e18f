"""Document deduplication suite for large-scale training-data pipelines.

Beyond the reference's scope (BASELINE.json pipeline mandate): exact
duplicate detection, MinHash+LSH near-dup, SimHash fingerprints, and n-gram
Jaccard verification — each as declarative DataFrame plans.

Design notes for 100 TB scale:
- **Exact**: hash-groupBy on ``md5(text)`` — map-side partial agg; only
  duplicate hash groups survive the shuffle.
- **MinHash**: signatures via ``num_hashes`` seeded md5 min-aggregates over
  the doc's shingle set — ONE explode + ONE groupBy, all JVM. md5 (not
  xxhash) so results are reproducible across engines/runs; the min is taken
  on the hex string (a uniform total order — exactly what MinHash needs).
- **LSH**: signatures split into ``bands``; candidate pairs = docs sharing a
  band hash, found by a groupBy on (band_idx, band_hash) + within-bucket
  pairing. Bucket sizes are capped (``max_bucket``) so a degenerate bucket
  (e.g. empty docs) cannot produce a quadratic pair explosion — capped
  buckets are dropped and reported, mirroring the evidence-cap policy.
- **Jaccard verify**: candidate pairs are re-scored exactly via a
  token-intersection join (counts only, no arrays shuffled).
- **SimHash**: 64-bit fingerprint computed as 4×16-bit chunks from md5 hex
  digits — pure column expressions; near-pairs block on equal chunks
  (Hamming ≤ 3 guarantee via pigeonhole) and verify with bit_count(xor).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.operators.caps import report_dropped as _report_dropped
from desbordante_spark.sources.readers import spread_small_input

__all__ = [
    "exact_duplicates",
    "doc_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "near_duplicates",
    "simhash",
    "simhash_near_pairs",
]


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate groups: ``(text_hash, cnt, min_id)`` for texts seen
    more than once. Keep ``min_id``, drop the rest."""
    # no input spread (measured): the md5 hash-groupBy compresses map-side
    # (one partial row per distinct text), so the serial scan+hash is
    # cheaper than an extra full-text exchange
    h = F.md5(F.col(text_col)).alias("text_hash")
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(h)
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("min_id"))
        .filter(F.col("cnt") > 1)
    )


def _shingle_rows(
    df: DataFrame, id_col: str, text_col: str, shingle_words: int
) -> DataFrame:
    """Row-local shingle stream ``(id, shingle)`` deduped *within* each row
    via ``array_distinct`` (no shuffle) — cross-row duplicates (same id on
    several rows) may remain; callers needing set semantics add
    ``.distinct()`` on top (the within-row dedup still shrinks that
    shuffle). The token array is materialized in its own projection: a
    higher-order transform re-evaluates subtrees under its lambda per
    element, so an inline split() would re-tokenize the document per gram
    position (O(T^2) per doc)."""
    t = F.col(text_col)
    base = spread_small_input(
        df.filter(t.isNotNull() & (F.trim(t) != "")).select(
            F.col(id_col).alias("id"), t.alias("_t")
        )
    ).select("id", F.split(F.trim(F.col("_t")), r"\s+").alias("_toks"))
    toks = F.col("_toks")
    if shingle_words == 1:
        sh = toks
    else:
        n = shingle_words
        sh = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    return (
        base.select("id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def doc_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_words: int = 1
) -> DataFrame:
    """Distinct shingles per doc: ``(id, shingle)``. ``shingle_words=1`` →
    word tokens; n>1 → space-joined word n-grams (rolling window over the
    token array, computed JVM-side with transform/slice)."""
    return _shingle_rows(df, id_col, text_col, shingle_words).distinct()


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_words: int = 1,
) -> DataFrame:
    """MinHash signature per doc: ``(id, mh0..mh{k-1})`` where
    ``mh_j = min(md5('s<j>:' || shingle))`` over the doc's shingle set."""
    # min() is duplicate-insensitive, so the global (id, shingle) distinct
    # (a full extra shuffle + hash dedup) is unnecessary here: the row-local
    # array_distinct in _shingle_rows already bounds the md5 work, and the
    # groupBy's map-side partial aggregation sends one partial signature per
    # (partition, id) into the one remaining shuffle. Identical output.
    sh = _shingle_rows(df, id_col, text_col, shingle_words)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{j}:"), F.col("shingle")))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 200,
    dropped_report: dict | None = None,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a, id_b)`` (id_a < id_b) sharing at
    least one LSH band. Buckets larger than ``max_bucket`` are skipped
    (degenerate mass buckets would explode quadratically) — capped AND
    flagged: pass ``dropped_report={}`` to receive
    ``{"n_buckets_dropped", "n_ids_in_dropped"}`` counts (logged when > 0)."""
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{j}") for j in range(b * rows_per_band,
                                               (b + 1) * rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"),
                     F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    exploded = signatures.select(
        "id", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", "b.band_idx", "b.band_hash")
    _report_dropped(
        exploded.groupBy("band_idx", "band_hash").agg(
            F.count(F.lit(1)).alias("bsz")
        ),
        "bsz", max_bucket, dropped_report, "lsh_candidate_pairs",
    )
    buckets = (
        exploded.groupBy("band_idx", "band_hash")
        .agg(F.collect_list("id").alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    sorted_ids = F.array_sort("ids")
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    sorted_ids,
                    lambda a, i: F.transform(
                        F.slice(sorted_ids, i + 2, F.size("ids")),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs.distinct()


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_words: int = 1,
) -> DataFrame:
    """Exact Jaccard for candidate pairs:
    ``(id_a, id_b, inter, size_a, size_b, jaccard)``. Counts-only joins —
    shingle sets are never collected."""
    sh = doc_shingles(df, id_col, text_col, shingle_words)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.withColumnRenamed("id", "id_a")
    b = sh.withColumnRenamed("id", "id_b")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.withColumnRenamed("id", "id_a")
              .withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("set_size", "size_b"), "id_b")
    )
    inter_c = F.coalesce(F.col("inter"), F.lit(0))
    return out.select(
        "id_a",
        "id_b",
        inter_c.cast("long").alias("inter"),
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
        (
            inter_c.cast("double")
            / (F.col("size_a") + F.col("size_b") - inter_c).cast("double")
        ).alias("jaccard"),
    )


def near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_words: int = 1,
    max_bucket: int = 200,
    dropped_report: dict | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    exact Jaccard filter ≥ threshold."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_words)
    cand = lsh_candidate_pairs(sigs, num_hashes, bands, max_bucket,
                               dropped_report)
    scored = jaccard_pairs(df, cand, id_col, text_col, shingle_words)
    return scored.filter(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame, id_col: str, text_col: str, chunks: int = 4
) -> DataFrame:
    """SimHash fingerprint per doc as ``chunks`` 16-bit ints
    ``(id, sh0..sh{chunks-1})`` — 64 bits total, derived from md5 hex digits
    of the doc's distinct tokens (sign of per-bit vote sums; ties → 0)."""
    # one exchange instead of two: HashPartitioning(id) satisfies the
    # clustering requirement of BOTH the (id, shingle) distinct and the
    # final groupBy(id), so an explicit repartition("id") lets Spark run
    # the dedup and the vote aggregation without any further shuffle.
    # (array_distinct in _shingle_rows already dedupes within a row, so the
    # lost map-side partial dedup costs nothing.)
    sh = (
        _shingle_rows(df, id_col, text_col, 1)
        .repartition(F.col("id"))
        .distinct()
    )
    # md5 and the per-chunk 16-bit value are materialized ONCE per row as
    # attributes; each of the 64 bit-vote aggregates then costs one
    # shift+mask instead of re-deriving its hex digit (md5 + substring +
    # instr + div) inside every aggregate expression. Bit values are
    # identical: digit d of chunk c is nibble (3 - (d - 4c)) of _g{c}, so
    # the original (digit >> (3-k)) & 1 becomes (_g >> (15-4*(j//4)-j%4)) & 1.
    h = F.md5(F.col("shingle"))
    g = sh.select(
        "id",
        *[
            F.conv(F.substring(h, c * 4 + 1, 4), 16, 10).cast("int").alias(f"_g{c}")
            for c in range(chunks)
        ],
    )
    aggs = []
    for c in range(chunks):
        chunk = F.lit(0)
        for j in range(16):
            shift = 15 - 4 * (j // 4) - (j % 4)
            bit = F.shiftright(F.col(f"_g{c}"), shift).bitwiseAND(F.lit(1))
            vote = F.sum(bit * 2 - 1)
            chunk = chunk + F.when(vote > 0, F.lit(2**j)).otherwise(F.lit(0))
        aggs.append(chunk.cast("long").alias(f"sh{c}"))
    return g.groupBy("id").agg(*aggs)


def simhash_near_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int = 200,
    dropped_report: dict | None = None,
    partial_ok: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on each 16-bit chunk, verify
    ``bit_count(xor)`` ≤ ``max_hamming`` exactly.

    Candidate-generation contract: equal-chunk blocking is COMPLETE only for
    ``max_hamming ≤ chunks − 1`` (pigeonhole — fewer differing bits than
    chunks forces an equal chunk). A larger ``max_hamming`` still returns
    only pairs sharing at least one chunk — a recall-lossy candidate set
    (pairs differing in every chunk are missed); pass ``partial_ok=True`` to
    acknowledge that, else a ``UserWarning`` is raised. Over-cap buckets are
    capped AND flagged via ``dropped_report`` (see ``lsh_candidate_pairs``).
    """
    if max_hamming > chunks - 1 and not partial_ok:
        warnings.warn(
            f"simhash_near_pairs: max_hamming={max_hamming} > chunks-1="
            f"{chunks - 1}; equal-chunk blocking only guarantees recall up "
            f"to hamming {chunks - 1} — pairs differing in every chunk are "
            "missed. Pass partial_ok=True to silence.",
            UserWarning,
            stacklevel=2,
        )
    fp = fingerprints
    blocks = []
    for c in range(chunks):
        blocks.append(
            F.struct(F.lit(c).alias("blk"), F.col(f"sh{c}").alias("key"))
        )
    exploded = fp.select("id", *[f"sh{c}" for c in range(chunks)],
                         F.explode(F.array(*blocks)).alias("b"))
    sig = F.struct(*[F.col(f"sh{c}") for c in range(chunks)])
    _report_dropped(
        exploded.groupBy("b.blk", "b.key").agg(F.count(F.lit(1)).alias("bsz")),
        "bsz", max_bucket, dropped_report, "simhash_near_pairs",
    )
    buckets = (
        exploded.groupBy("b.blk", "b.key")
        .agg(F.collect_list(F.struct(F.col("id"), sig.alias("sig"))).alias("xs"))
        .filter((F.size("xs") > 1) & (F.size("xs") <= max_bucket))
    )
    xs = F.array_sort("xs")
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    xs,
                    lambda a, i: F.transform(
                        F.slice(xs, i + 2, F.size("xs")),
                        lambda b: F.struct(
                            a["id"].alias("id_a"),
                            b["id"].alias("id_b"),
                            a["sig"].alias("sig_a"),
                            b["sig"].alias("sig_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*").distinct()
    ham = None
    for c in range(chunks):
        t = F.bit_count(
            F.col(f"sig_a.sh{c}").bitwiseXOR(F.col(f"sig_b.sh{c}"))
        )
        ham = t if ham is None else ham + t
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
