"""Dedup suite, embedding similarity, and text functions — brute-force
Python cross-checks plus determinism goldens."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from desbordante_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from desbordante_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicates,
    simhash,
    simhash_near_pairs,
)
from desbordante_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)

D1 = "the quick brown fox jumps over the lazy dog and runs away fast"
D3 = "the quick brown fox jumps over the lazy cat and runs away fast"
D4 = "completely different text about spark aggregation pipelines here now"
D6 = "yet another unrelated document mentioning neither foxes nor dogs"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [("d1", D1), ("d2", D1), ("d3", D3), ("d4", D4), ("d6", D6)]
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_exact_duplicates(corpus):
    groups = exact_duplicates(corpus, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["cnt"] == 2 and groups[0]["min_id"] == "d1"


def test_minhash_signature_properties(corpus):
    sigs = {r["id"]: r for r in
            minhash_signatures(corpus, "doc_id", "text", num_hashes=8).collect()}
    # identical docs → identical signatures
    assert [sigs["d1"][f"mh{j}"] for j in range(8)] == [
        sigs["d2"][f"mh{j}"] for j in range(8)
    ]
    # signature values are the true min over the shingle set (python oracle)
    toks = set(D1.split())
    for j in range(8):
        expect = min(
            hashlib.md5(f"s{j}:{t}".encode()).hexdigest() for t in toks
        )
        assert sigs["d1"][f"mh{j}"] == expect


def test_lsh_and_jaccard(corpus):
    sigs = minhash_signatures(corpus, "doc_id", "text", num_hashes=8)
    cand = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert ("d1", "d2") in pairs  # identical docs always collide
    scored = {
        (r["id_a"], r["id_b"]): r
        for r in jaccard_pairs(corpus, cand, "doc_id", "text").collect()
    }
    assert scored[("d1", "d2")]["jaccard"] == pytest.approx(1.0)
    if ("d1", "d3") in scored:
        a, b = set(D1.split()), set(D3.split())
        expect = len(a & b) / len(a | b)
        assert scored[("d1", "d3")]["jaccard"] == pytest.approx(expect)


def test_near_duplicates_pipeline(corpus):
    nd = near_duplicates(corpus, "doc_id", "text", threshold=0.5, num_hashes=8,
                         bands=8)  # bands=8 → 1 hash per band, max recall
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in nd.collect()}
    assert ("d1", "d2") in got
    assert ("d1", "d3") in got  # high-jaccard pair must be caught
    assert ("d1", "d4") not in got


def test_simhash(corpus):
    fps = {r["id"]: tuple(r[f"sh{c}"] for c in range(4))
           for r in simhash(corpus, "doc_id", "text").collect()}
    assert fps["d1"] == fps["d2"]
    assert all(0 <= v < 2**16 for v in fps["d1"])
    # similar docs differ in few bits; different docs in many
    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    assert ham(fps["d1"], fps["d3"]) < ham(fps["d1"], fps["d4"])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_pairs(
                 simhash(corpus, "doc_id", "text"), max_hamming=3).collect()}
    assert pairs[("d1", "d2")] == 0


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.95, 0.05]),
        (5, [0.5, 0.5, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_cosine_topk_bruteforce(vectors):
    q = vectors.filter("vec_id = 1")
    res = cosine_topk_bruteforce(q, vectors, "vec_id", "vec_id", k=2).collect()
    assert [r["neighbor_id"] for r in res] == [2, 5]
    assert res[0]["cosine"] == pytest.approx(_cos([1, 0, 0], [0.9, 0.1, 0]))
    assert [r["rank"] for r in res] == [1, 2]


def test_cosine_topk_lsh_recall(vectors):
    q = vectors.filter("vec_id <= 2")
    brute = cosine_topk_bruteforce(q, vectors, "vec_id", "vec_id", k=1).collect()
    ann = cosine_topk_lsh(q, vectors, "vec_id", "vec_id", k=1, planes=4).collect()
    b = {(r["query_id"], r["neighbor_id"]) for r in brute}
    a = {(r["query_id"], r["neighbor_id"]) for r in ann}
    # multiprobe LSH at this tiny scale must recover the exact top-1
    assert a == b


def test_embedding_near_dup(vectors):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(
            vectors, "vec_id", threshold=0.95, planes=2
        ).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] == pytest.approx(_cos([1, 0, 0], [0.9, 0.1, 0]))
    assert (1, 3) not in pairs


def test_text_functions(spark):
    rows = [
        (1, "the cat is on the mat"),
        (2, "der Hund ist nicht da und der Vogel"),
        (3, "el perro es de la casa y no es del gato"),
        (4, "你好世界 这是 中文 文本"),
        (5, ""),
        (6, "xqz zzk blorp"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in df.select(
        "id",
        token_count("text").alias("n_tok"),
        lang_id("text").alias("lang"),
    ).collect()}
    assert out[1]["n_tok"] == 6 and out[1]["lang"] == "en"
    assert out[2]["lang"] == "de"
    assert out[3]["lang"] == "es"
    assert out[4]["lang"] == "zh"
    assert out[5]["lang"] == "unknown" and out[5]["n_tok"] == 0
    assert out[6]["lang"] == "unknown"


def test_quality_and_fingerprint(spark):
    rows = [(1, "A clean readable english sentence with the usual words in it."),
            (2, "1234 5678 $$$ ### 9999 @@@@"),
            (3, "A clean readable english sentence with the usual words in it.")]
    df = spark.createDataFrame(rows, "id long, text string")
    q = {r["id"]: r["quality"] for r in quality_score(df, "text", "id").collect()}
    assert q[1] > q[2]
    fp = {r["id"]: r["fingerprint"] for r in doc_fingerprint(df, "text", "id").collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


def test_lang_id_table_matches_scalar(spark):
    from desbordante_spark.functions.text import lang_id, lang_id_table

    rows = [
        (1, "the cat is on the mat"),
        (2, "der Hund ist nicht da und der Vogel"),
        (3, "el perro es de la casa y no es del gato"),
        (4, "你好世界 这是 中文 文本"),
        (5, ""),
        (6, "xqz zzk blorp"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    scalar = {r["id"]: r["l"] for r in
              df.select("id", lang_id("text").alias("l")).collect()}
    table = {r["id"]: r["pred_lang"] for r in
             lang_id_table(df, "text", "id").collect()}
    assert scalar == table


def test_cosine_topk_ivf_recall(vectors):
    from pyspark.sql import functions as F

    from desbordante_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        ivf_assign,
        ivf_centroids,
    )

    q = vectors.filter(F.col("vec_id") < 5)
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk_bruteforce(q, vectors, "vec_id", "vec_id",
                                        k=1).collect()
    }
    # probing every centroid makes IVF exhaustive → must equal brute force
    cents = ivf_centroids(vectors, "vec_id", k=4)
    assert cents.count() == 4
    assigned = ivf_assign(vectors, cents, "vec_id")
    assert assigned.count() == vectors.count()  # total partition of corpus
    full = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk_ivf(q, vectors, "vec_id", "vec_id", k=1,
                                 n_centroids=4, nprobe=4).collect()
    }
    assert full == exact
    # nprobe=1 still returns some neighbors (recall may drop, never crash)
    part = cosine_topk_ivf(q, vectors, "vec_id", "vec_id", k=1,
                           n_centroids=4, nprobe=1).collect()
    assert 0 < len(part) <= 5
