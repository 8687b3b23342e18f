"""Suite runner: per-partition verdicts, checkpoint/resume, lineage rows
(FIXTURES.md verification-harness contract: re-run after simulated interrupt
skips completed partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from desbordante_spark.plans.runner import Constraint, SuiteRunner
from desbordante_spark.sources.interleaved import (
    generate_documents,
    generate_media_catalog,
)

N_DOCS = 3000
N_MEDIA = 400


def _suite():
    return [
        Constraint("doc_id_unique", "uniqueness", {"columns": ["doc_id"]}),
        Constraint("span_wellformed", "span", {}),
        Constraint(
            "media_refs_resolve",
            "referential",
            {
                "lhs_frame": lambda df: df.select(
                    "part_key", F.explode("spans").alias("s")
                ).select("part_key", F.col("s.media_ref").alias("media_ref")),
                "lhs": ["media_ref"],
                "rhs_table": "media_catalog",
                "rhs": ["media_ref"],
            },
        ),
        Constraint(
            "span_count_drift",
            "drift",
            {
                "value_col": "n_spans",
                "value_expr": F.size("spans"),
                "discrete": True,
                "ks_threshold": 0.2,
            },
        ),
    ]


@pytest.fixture()
def env(spark, tmp_path):
    docs = generate_documents(spark, N_DOCS, dup_pairs=3, n_media=N_MEDIA).cache()
    catalog = generate_media_catalog(spark, N_MEDIA).cache()
    return docs, catalog, str(tmp_path / "ckpt")


def test_suite_per_partition_verdicts(spark, env):
    docs, catalog, ckpt = env
    runner = SuiteRunner(spark, ckpt, snapshot_id="snap1")
    out = runner.run(docs, _suite(), aux={"media_catalog": catalog})
    rows = out.collect()
    # 4 constraints × 16 partitions
    by_c = {}
    for r in rows:
        by_c.setdefault(r["constraint"], []).append(r)
    assert set(by_c) == {"doc_id_unique", "span_wellformed",
                         "media_refs_resolve", "span_count_drift"}
    assert all(len(v) == 16 for v in by_c.values())
    # lineage columns populated
    assert all(r["snapshot_id"] == "snap1" and r["run_id"] for r in rows)
    # duplicates injected → some partition fails uniqueness; totals add up
    ucc = by_c["doc_id_unique"]
    assert sum(r["total_rows"] for r in ucc) == N_DOCS
    assert sum(r["num_violating_rows"] for r in ucc) == 6
    assert any(r["holds"] == 0 for r in ucc)
    # drift fires exactly on the shifted partition
    drift = {r["partition"]: r for r in by_c["span_count_drift"]}
    assert [p for p, r in drift.items() if r["holds"] == 0] == ["p015"]
    # dangling refs → referential failures somewhere
    assert any(r["holds"] == 0 for r in by_c["media_refs_resolve"])


def test_resume_skips_completed(spark, env):
    docs, catalog, ckpt = env
    r1 = SuiteRunner(spark, ckpt, snapshot_id="snapA")
    # simulate an interrupted run: only the uniqueness constraint, only half
    # the partitions
    half = docs.filter(F.col("part_key") < "p008")
    out1 = r1.run(half, [_suite()[0]], aux={"media_catalog": catalog})
    assert out1.count() == 8
    # resumed full run: uniqueness re-verifies ONLY the remaining 8 partitions
    r2 = SuiteRunner(spark, ckpt, snapshot_id="snapA")
    out2 = r2.run(docs, [_suite()[0]], aux={"media_catalog": catalog})
    parts2 = sorted(r["partition"] for r in out2.collect())
    assert len(parts2) == 8
    assert all(p >= "p008" for p in parts2)
    # checkpoint now covers all 16 under snapA
    done = r2.completed_partitions("doc_id_unique").count()
    assert done == 16
    # a NEW snapshot re-verifies everything
    r3 = SuiteRunner(spark, ckpt, snapshot_id="snapB")
    out3 = r3.run(docs, [_suite()[0]], aux={"media_catalog": catalog})
    assert out3.count() == 16


def test_resume_noop_when_complete(spark, env):
    docs, catalog, ckpt = env
    r1 = SuiteRunner(spark, ckpt, snapshot_id="s")
    r1.run(docs, [_suite()[0]], aux={"media_catalog": catalog})
    r2 = SuiteRunner(spark, ckpt, snapshot_id="s")
    out = r2.run(docs, [_suite()[0]], aux={"media_catalog": catalog})
    assert out.count() == 0  # nothing left to verify


def test_runner_fd_and_custom_kinds(spark, env):
    docs, catalog, ckpt = env
    from pyspark.sql import functions as F

    from desbordante_spark.operators.ucc import ucc_metrics_df

    suite = [
        # FD: part_key is derived from doc_id, so doc_id -> part_key holds
        Constraint("docid_determines_part", "fd",
                   {"lhs": ["doc_id"], "rhs": ["part_key"]}),
        Constraint(
            "custom_span_nonempty", "custom",
            {"fn": lambda df, by: ucc_metrics_df(
                df.withColumn("n", F.size("spans")), ["doc_id", "n"], by=by)},
        ),
    ]
    out = SuiteRunner(spark, ckpt + "2", "s2").run(
        docs, suite, aux={"media_catalog": catalog}
    )
    rows = {(r["constraint"], r["partition"]): r for r in out.collect()}
    assert len(rows) == 32
    fd_rows = [r for (c, _), r in rows.items() if c == "docid_determines_part"]
    assert all(r["holds"] == 1 for r in fd_rows)
