"""Discovery miners (TANE-style FD/UCC, Spider-style IND) cross-validated
against the verifiers — the reference's discovery↔verification agreement
property (test_ucc_verifier.cpp:96-123, UCCVerifierWithHyUCC pattern)."""

from __future__ import annotations

from itertools import combinations

import pytest

from desbordante_spark.discovery.spider import discover_unary_inds
from desbordante_spark.discovery.tane import discover_fds, discover_uccs
from desbordante_spark.operators.fd import fd_verify
from desbordante_spark.operators.ucc import ucc_verify
from desbordante_spark.pipelines.typo_miner import find_typo_candidates


def test_discover_uccs_matches_verifier(spark, testfd):
    df = testfd.drop("row_id")
    cols = df.columns
    uccs = discover_uccs(df, max_size=2)
    # every discovered UCC verifies; every non-discovered candidate up to
    # size 2 that is not a superset of a UCC fails verification
    for u in uccs:
        assert ucc_verify(df, list(u)).holds, u
    discovered = set(uccs)
    for size in (1, 2):
        for cand in combinations(cols, size):
            c = tuple(sorted(cand))
            is_super = any(set(u) <= set(c) for u in discovered)
            if not is_super:
                assert not ucc_verify(df, list(c)).holds, c


def test_discover_fds_matches_verifier(spark, testfd):
    df = testfd.drop("row_id")
    fds = discover_fds(df, max_lhs=2)
    assert fds, "TestFD has FDs"
    # Col0 is constant -> empty-LHS FD
    assert ((), "Col0") in fds
    # the golden holding FD {Col1} -> {Col0} (test_fd_verifier.cpp) is implied
    # by the constant; the miner reports the minimal () -> Col0 instead
    for lhs, rhs in fds:
        if lhs == ():
            continue
        assert fd_verify(df, list(lhs), [rhs]).holds, (lhs, rhs)
    # minimality: no reported FD's LHS contains another reported LHS for the
    # same RHS
    by_rhs: dict[str, list] = {}
    for lhs, rhs in fds:
        by_rhs.setdefault(rhs, []).append(set(lhs))
    for rhs, lhss in by_rhs.items():
        for a in lhss:
            for b in lhss:
                assert a is b or not (a < b)


def test_discover_fds_finds_known(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "b", "y")],
        "id long, k string, v string",
    )
    fds = discover_fds(df, max_lhs=1)
    assert (("k",), "v") in fds and (("v",), "k") in fds
    # id is a key: its FDs are minimal (nothing smaller determines k/v) and
    # ARE reported — reference parity (README university_fd output includes
    # key LHS); id is also reported as a UCC by the UCC miner
    assert (("id",), "k") in fds and (("id",), "v") in fds
    assert ("id",) in discover_uccs(df, max_size=1)


def test_discover_unary_inds(spark):
    t1 = spark.createDataFrame([(1,), (2,), (3,)], "a long")
    t2 = spark.createDataFrame([(1,), (2,), (3,), (4,)], "b long")
    out = discover_unary_inds({"t1": t1, "t2": t2})
    rows = {(r["lhs"], r["rhs"]): r for r in out.collect()}
    assert ("t1.a", "t2.b") in rows          # a ⊆ b
    assert ("t2.b", "t1.a") not in rows      # b ⊄ a
    ainds = discover_unary_inds({"t1": t1, "t2": t2}, max_error=0.3)
    rows = {(r["lhs"], r["rhs"]): r for r in ainds.collect()}
    assert rows[("t2.b", "t1.a")]["error"] == pytest.approx(0.25)


def test_typo_miner(spark):
    rows = (
        [("k1", "london")] * 8 + [("k1", "lodnon")] * 1
        + [("k2", "paris")] * 5 + [("k2", "tokyo")] * 4
        + [("k3", "berlin")] * 3
    )
    df = spark.createDataFrame(rows, "k string, city string")
    out = find_typo_candidates(df, ["k"], "city", radius=2, ratio=0.6)
    got = [(r["k"], r["majority_value"], r["candidate_value"], r["distance"])
           for r in out.collect()]
    # k1: 'lodnon' is within 2 edits of majority 'london' -> typo candidate
    assert got == [("k1", "london", "lodnon", 2)]
    # k2: tokyo is far from paris AND majority ratio < 0.6 -> excluded
