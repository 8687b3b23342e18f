"""Embedding similarity search (brute-force exact + LSH-bucketed scale path).

Training-data pipeline mandate (BASELINE.json): approximate-nearest-neighbor
over an ``array<float>`` embedding column.

- **Brute-force cosine top-k** — the exactness baseline: broadcast the query
  set, score every (query, corpus) pair with a JVM-side
  ``aggregate(zip_with(...))`` dot product (no Python in the hot path), rank
  per query with a SALTED TWO-LEVEL top-k (``_topk_per_query``): level 1
  keeps each (query, salt) slice's top-k, level 2 ranks the ≤ salt·k
  survivors — no reducer ever holds a query's full candidate set. Cost
  O(|Q|·|C|) — fine for |Q| small; at 100 TB the corpus scan is
  embarrassingly parallel and shuffle-free until that bounded cut. The
  LSH/IVF paths share the same final cut.
- **Random-hyperplane LSH buckets** — the scale path: ``planes`` sign bits
  from deterministic pseudo-random hyperplanes. Plane components derive from
  ``md5("pl<seed>:<plane>:<dim>")`` (the project's cross-engine hash
  convention, CLAUDE.md) computed once on the driver and inlined as literal
  arrays — no stored model, same buckets on any cluster, and the same plane
  values are reproducible in plain SQL (DuckDB oracle parity). Neighbor
  candidates come only from the query's bucket (plus optional multi-probe by
  flipping one bit), then exact cosine re-scoring. Recall is tunable via
  planes/probes; the candidate join is a hash join on bucket id.
- **Embedding near-dup pairs** — all corpus pairs in the same bucket with
  cosine ≥ threshold (the embedding-cosine dedup entry of the suite).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from desbordante_spark.operators.caps import report_dropped as _report_dropped
from desbordante_spark.sources.readers import spread_small_input

__all__ = [
    "cosine_topk_bruteforce",
    "plane_components",
    "lsh_bucket",
    "cosine_topk_lsh",
    "ivf_centroids",
    "ivf_assign",
    "cosine_topk_ivf",
    "embedding_near_dup_pairs",
]


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _topk_per_query(
    scored: DataFrame, k: int, salt_parts: int = 32
) -> DataFrame:
    """Salted two-level top-k: no reducer ever holds a query's full
    candidate set. Level 1 ranks within ``(query_id, salt)`` — each query's
    candidates spread over ``salt_parts`` reducers, each keeping only its
    local top-k — so level 2's global rank runs over at most
    ``salt_parts * k`` survivors per query. Output is IDENTICAL to a single
    per-query window (the global top-k is contained in the union of the
    per-salt top-ks); the salt is a deterministic hash of the neighbor id,
    so results are stable across runs and partition layouts."""
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col("neighbor_id").cast("string")),
                   F.lit(salt_parts)),
        )
        .withColumn("_prn", F.row_number().over(w1))
        .filter(F.col("_prn") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .drop("_salt", "_prn")
    )


def _norm(v: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k: ``(query_id, neighbor_id, cosine, rank)``.

    Deterministic ranking: cosine desc, neighbor id asc on ties.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = spread_small_input(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
    ).withColumn("cn", _norm(F.col("cv")))
    j = F.broadcast(q).crossJoin(c)
    if exclude_self:
        j = j.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = j.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv"))
         / F.when(F.col("qn") * F.col("cn") > 0, F.col("qn") * F.col("cn"))
         .otherwise(F.lit(1.0))).alias("cosine"),
    )
    return _topk_per_query(scored, k)


def plane_components(planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplane components in [−1, 1]: component ``i`` of
    plane ``p`` is ``(int(md5("pl<seed>:<p>:<i>")[:8], 16) % 2001 − 1000) /
    1000``. Pure Python, tiny (planes × dim floats) — inlined as literals so
    both Spark and any SQL oracle reproduce the exact same buckets."""
    return [
        [
            (
                int(
                    hashlib.md5(f"pl{seed}:{p}:{i}".encode()).hexdigest()[:8], 16
                )
                % 2001
                - 1000
            )
            / 1000.0
            for i in range(dim)
        ]
        for p in range(planes)
    ]


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from {vec_col!r}")
    return int(row["d"])


def lsh_bucket(
    vec_col: str = "embedding",
    planes: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> F.Column:
    """Random-hyperplane bucket id (int column expression): bit ``p`` set iff
    ``dot(v, plane_p) > 0``. Planes are literal arrays (``plane_components``)
    — the dot product runs entirely in whole-stage codegen, zero hashing per
    row."""
    v = F.col(vec_col)
    bucket = F.lit(0)
    for p, comps in enumerate(plane_components(planes, dim, seed)):
        plane = F.array(*[F.lit(x) for x in comps])
        s = _dot(v, plane)
        bucket = bucket + F.when(s > 0, F.lit(2**p)).otherwise(F.lit(0))
    # Guard against a dim mismatch: zip_with pads the shorter side with
    # NULLs, the dot product goes NULL, every sign test is false and ALL
    # rows silently collapse into bucket 0. Fail loudly instead — but a
    # NULL embedding is not a dim mismatch: it gets a NULL bucket (the row
    # simply drops out of every bucket equi-join) rather than aborting the
    # whole job with a NULL-message raise_error.
    return (
        F.when(v.isNull(), F.lit(None))
        .when(F.size(v) == F.lit(dim), bucket)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"lsh_bucket: vector dim != configured dim {dim} (got "),
                    F.size(v).cast("string"),
                    F.lit(")"),
                )
            )
        )
        .cast("int")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k: candidates from the query's hyperplane bucket (plus, with
    ``multiprobe``, all buckets at Hamming distance 1), exact cosine
    re-scoring. Same output schema as the brute-force path. ``dim`` is probed
    from the corpus when not given (one ``first()`` on the driver)."""
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    qb = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(vec_col, planes, seed, dim).alias("b"),
    )
    if multiprobe:
        probes = F.array(
            F.col("b"), *[F.col("b").bitwiseXOR(F.lit(2**p)) for p in range(planes)]
        )
        qb = qb.select(
            "query_id", "qv", F.explode(probes).alias("bucket")
        )
    else:
        qb = qb.select("query_id", "qv", F.col("b").alias("bucket"))
    qb = qb.withColumn("qn", _norm(F.col("qv")))
    cb = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(vec_col, planes, seed, dim).alias("bucket"),
    ).withColumn("cn", _norm(F.col("cv")))
    j = F.broadcast(qb).join(cb, "bucket")
    if exclude_self:
        j = j.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = j.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv"))
         / F.when(F.col("qn") * F.col("cn") > 0, F.col("qn") * F.col("cn"))
         .otherwise(F.lit(1.0))).alias("cosine"),
    ).groupBy("query_id", "neighbor_id").agg(F.max("cosine").alias("cosine"))
    return _topk_per_query(scored, k)


def ivf_centroids(
    corpus: DataFrame,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 16,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF coarse quantizer: ``k`` centroids picked deterministically from
    the corpus itself — the vectors whose ``md5(id)`` sorts lowest (a seeded
    uniform sample with no stored model; reproducible in plain SQL and
    identical on any cluster). Returns ``(centroid_id, cvec)`` with dense
    ids 0..k-1 in md5 order.

    ``refine_iters > 0`` runs that many Lloyd (k-means) iterations on the
    seeds — each iteration is one broadcast assign + one element-wise mean
    (posexplode → groupBy(centroid, position) avg → re-assemble), so the
    cost is ``refine_iters`` linear passes. Refinement improves recall on
    clustered corpora but floating-point partial-sum order makes the
    refined centroids not bit-reproducible across partition layouts — keep
    the default 0 for oracle-exact paths; empty clusters retain their seed.

    Scale shape: ``orderBy(...).limit(k)`` plans as a distributed
    TakeOrderedAndProject (per-partition top-k, tiny merge on the driver) —
    NOT a global window, which would sort the whole corpus in one partition
    to pick ``k`` rows. The dense-id window then runs over only ``k`` rows."""
    picked = (
        corpus.select(
            F.md5(F.col(corpus_id).cast("string")).alias("_m"),
            F.col(vec_col).alias("cvec"),
        )
        .orderBy("_m")
        .limit(k)
    )
    w = Window.orderBy("_m")  # k rows only — single tiny partition is fine
    cents = (
        picked.withColumn("_rn", F.row_number().over(w))
        .select((F.col("_rn") - 1).cast("int").alias("centroid_id"), "cvec")
    )
    for _ in range(int(refine_iters)):
        cents = cents.localCheckpoint(eager=True)  # k rows; cut the lineage
        assigned = ivf_assign(
            corpus.select(F.col(corpus_id).alias("_id"),
                          F.col(vec_col).alias("_v")),
            cents, "_id", "_v",
        )
        e = assigned.select(
            "centroid_id", F.posexplode(F.col("_v")).alias("pos", "x")
        )
        means = (
            e.groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("mvec")
            )
        )
        cents = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("mvec"),
                           F.transform(F.col("cvec"),
                                       lambda x: x.cast("double")))
                .alias("cvec"),
            )
        )
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Assign every row (unique ``id_col``) to its nearest centroid by
    cosine (ties → lowest centroid id) with a ROW-LOCAL argmax: the (tiny)
    centroid table is collected once and inlined as literal arrays, all k
    cosines are computed inside one projection, and ``array_max`` over
    ``(cosine, -centroid_id)`` structs picks the winner. Adds ``out_col``
    to ``df``.

    Scale shape: ZERO extra shuffle and no row blow-up — the previous plan
    (``crossJoin(broadcast(centroids))`` + a ``row_number`` window
    partitioned by id) materialized |corpus|×k rows and exchanged+sorted
    all of them just to take a per-row argmax; at 100 TB with k=16 that is
    a ~16× data expansion through a shuffle this version simply does not
    have. Each centroid's norm folds over the SAME literal values the dot
    product uses (identical float op order → bit-identical cosines to the
    old plan and to the SQL oracle)."""
    cents = sorted(
        centroids.select("centroid_id", "cvec").collect(),
        key=lambda r: r["centroid_id"],
    )
    if not cents:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    v = F.col(vec_col)
    vn = _norm(v)
    choices = []
    for r in cents:
        cvec = F.array(*[F.lit(float(x)) for x in r["cvec"]])
        denom = vn * _norm(cvec)
        cos = (
            _dot(v, cvec)
            / F.when(denom > 0, denom).otherwise(F.lit(1.0))
        )
        choices.append(
            F.struct(
                # NULL-vec rows keep the old window behavior (all-NULL
                # scores → lowest centroid id) via a below-range sentinel
                F.coalesce(cos, F.lit(-2.0)).alias("cos"),
                F.lit(-int(r["centroid_id"])).alias("neg_id"),
            )
        )
    best = F.array_max(F.array(*choices))
    return df.withColumn(
        out_col, (-best["neg_id"]).cast("int")
    )


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    exclude_self: bool = True,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-flat ANN top-k: corpus rows are bucketed by nearest centroid
    (inverted lists); each query probes its ``nprobe`` nearest centroids'
    lists and re-scores exactly. Same output schema as the brute-force path.

    Scale shape: centroid table is tiny (broadcast twice); the corpus scan
    assigns + shuffles once on centroid_id; the probe is a hash join on
    centroid_id. Recall is tunable via nprobe/n_centroids, and
    ``refine_iters`` Lloyd iterations on the quantizer (see
    ``ivf_centroids`` — keep 0 for bit-reproducible paths)."""
    cents = ivf_centroids(corpus, corpus_id, vec_col, n_centroids,
                          refine_iters)
    cb = ivf_assign(
        corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      F.col(vec_col).alias("cv")),
        cents, "neighbor_id", "cv", "centroid_id",
    ).withColumn("cn", _norm(F.col("cv")))
    # query → nprobe nearest centroids
    qv = F.col("qv")
    qcos = (
        _dot(qv, F.col("cvec"))
        / F.when(_norm(qv) * _norm(F.col("cvec")) > 0,
                 _norm(qv) * _norm(F.col("cvec"))).otherwise(F.lit(1.0))
    )
    qscored = (
        queries.select(F.col(query_id).alias("query_id"),
                       F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn("_cos", qcos)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qscored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "centroid_id")
        .withColumn("qn", _norm(F.col("qv")))
    )
    j = F.broadcast(probes).join(cb, "centroid_id")
    if exclude_self:
        j = j.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = j.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv"))
         / F.when(F.col("qn") * F.col("cn") > 0, F.col("qn") * F.col("cn"))
         .otherwise(F.lit(1.0))).alias("cosine"),
    )
    return _topk_per_query(scored, k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
    seed: int = 42,
    max_bucket: int = 1000,
    dim: int | None = None,
    dropped_report: dict | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicates ``(id_a, id_b, cosine)``: candidates
    within an LSH bucket, exact cosine ≥ threshold. Oversized buckets are
    dropped — capped AND flagged: pass ``dropped_report={}`` to receive
    ``{"n_buckets_dropped": int, "n_ids_in_dropped": int}`` (one tiny extra
    aggregate over the bucket-size frame; a warning is logged when > 0)."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(vec_col, planes, seed, dim).alias("bucket"),
    ).withColumn("n", _norm(F.col("v")))
    sizes = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("bsz"))
    _report_dropped(sizes, "bsz", max_bucket, dropped_report,
                    "embedding_near_dup_pairs")
    base = base.join(
        F.broadcast(sizes.filter(F.col("bsz") <= max_bucket)), "bucket"
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id")),
    )
    scored = pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (_dot(F.col("a.v"), F.col("b.v"))
         / F.when(F.col("a.n") * F.col("b.n") > 0, F.col("a.n") * F.col("b.n"))
         .otherwise(F.lit(1.0))).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold)
