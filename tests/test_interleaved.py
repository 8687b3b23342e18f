"""Interleaved-document generator + span invariant + referential + drift.

Golden strategy: injected violation counts are derivable from the generator
parameters by construction (FIXTURES.md F1); everything else is cross-checked
against a brute-force Python recomputation over the collected small table —
the same verifier-vs-oracle strategy the reference uses
(src/tests/test_ucc_verifier.cpp:96-123)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from desbordante_spark.operators.drift import drift_metrics, histogram_sketch
from desbordante_spark.operators.ind import ind_verify
from desbordante_spark.operators.span_invariant import (
    span_invariant_verify,
    span_sequence_equality,
    span_wellformed_violations,
)
from desbordante_spark.operators.ucc import ucc_verify
from desbordante_spark.sources.interleaved import (
    generate_documents,
    generate_media_catalog,
)

N_DOCS = 2000
DUP_PAIRS = 2
N_MEDIA = 500


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents(
        spark, N_DOCS, dup_pairs=DUP_PAIRS, n_media=N_MEDIA
    ).cache()


@pytest.fixture(scope="module")
def catalog(spark):
    return generate_media_catalog(spark, N_MEDIA).cache()


def test_shape_and_determinism(spark, docs):
    assert docs.count() == N_DOCS
    assert docs.select("doc_id").distinct().count() == N_DOCS - DUP_PAIRS
    # same (seed, size) → identical table
    again = generate_documents(spark, N_DOCS, dup_pairs=DUP_PAIRS, n_media=N_MEDIA)
    assert docs.exceptAll(again).count() == 0
    assert again.exceptAll(docs).count() == 0


def test_doc_id_uniqueness_golden(docs):
    res = ucc_verify(docs, ["doc_id"])
    assert not res.holds
    assert res.num_violating_clusters == DUP_PAIRS
    assert res.num_violating_rows == 2 * DUP_PAIRS
    expected = DUP_PAIRS * 2 * 1 / (N_DOCS * (N_DOCS - 1))
    assert res.error == pytest.approx(expected, abs=1e-15)


def test_span_invariant_matches_bruteforce(docs):
    rows = docs.collect()
    expect_bad = set()
    for r in rows:
        spans = r["spans"]
        ok = all(s["offset"] == i for i, s in enumerate(spans))
        ok &= all(s["kind"] in ("text", "image", "audio", "video") for s in spans)
        ok &= all(
            (s["text"] != "" and s["text"] is not None)
            if s["kind"] == "text"
            else s["text"] == ""
            for s in spans
        )
        ok &= all(
            (s["media_ref"] is None)
            if s["kind"] == "text"
            else s["media_ref"] is not None
            for s in spans
        )
        if not ok:
            expect_bad.add((r["doc_id"], r["part_key"]))
    got = {
        (r["doc_id"],)
        for r in span_wellformed_violations(docs).collect()
    }
    assert {(d,) for d, _ in expect_bad} == got
    res = span_invariant_verify(docs)
    assert res.num_violating_rows == len(expect_bad)
    assert not res.holds
    # injected violations are offset-order only
    reasons = {
        tuple(r["reasons"])
        for r in span_wellformed_violations(docs).collect()
    }
    assert reasons == {("offset_order",)}


def test_clean_generator_holds(spark):
    clean = generate_documents(
        spark, 500, dup_pairs=0, offset_viol_every=0, n_media=N_MEDIA
    )
    assert span_invariant_verify(clean).holds
    assert ucc_verify(clean, ["doc_id"]).holds


def test_referential_golden(docs, catalog):
    refs = docs.select(
        F.explode("spans").alias("s")
    ).select(F.col("s.media_ref").alias("media_ref"))
    res = ind_verify(refs, ["media_ref"], catalog, ["media_ref"])
    assert not res.holds
    # every missing ref is x-prefixed (dangling by construction), and every
    # x-prefixed distinct ref is missing
    missing = res.violations.collect()
    assert all(r["media_ref"].startswith("x") for r in missing)
    n_x = (
        refs.filter(F.col("media_ref").startswith("x")).distinct().count()
    )
    assert res.num_violating_clusters == n_x
    # m-prefixed refs are all present
    m_refs = refs.filter(F.col("media_ref").startswith("m"))
    assert ind_verify(m_refs, ["media_ref"], catalog, ["media_ref"]).holds


def test_span_sequence_equality(spark):
    a = generate_documents(spark, 300, dup_pairs=0, n_media=N_MEDIA)
    b = generate_documents(spark, 300, dup_pairs=0, n_media=N_MEDIA)
    assert span_sequence_equality(a, b).count() == 0
    # perturb: drop the first span of one doc, change kind of another
    perturbed = b.withColumn(
        "spans",
        F.when(
            F.col("doc_id") == "doc000000000007", F.slice("spans", 2, 100)
        ).otherwise(F.col("spans")),
    )
    diff = span_sequence_equality(a, perturbed).collect()
    assert [(r["doc_id"], r["status"]) for r in diff] == [
        ("doc000000000007", "mismatch")
    ]
    # missing doc on one side
    shorter = b.filter(F.col("doc_id") != "doc000000000005")
    diff2 = {r["doc_id"]: r["status"] for r in span_sequence_equality(a, shorter).collect()}
    assert diff2 == {"doc000000000005": "only_left"}


def test_drift_detection(spark):
    big = generate_documents(spark, 4000, dup_pairs=0, n_media=N_MEDIA).cache()
    sketch = histogram_sketch(
        big.withColumn("n_spans", F.size("spans")), "n_spans", "part_key",
        discrete=True,
    )
    m = drift_metrics(sketch, ks_threshold=0.2)
    rows = {r["partition"]: r for r in m.collect()}
    assert len(rows) == 16
    drifted = [p for p, r in rows.items() if r["drifted"]]
    assert drifted == ["p015"]
    # the drifted partition has the largest KS by a wide margin
    ks = {p: r["ks_stat"] for p, r in rows.items()}
    top = max(ks, key=ks.get)
    assert top == "p015" and ks["p015"] > 0.4
    assert rows["p015"]["chi2_stat"] > rows["p000"]["chi2_stat"]
    big.unpersist()
