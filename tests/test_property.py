"""Property-based cross-checks: on random small tables, the Spark verifiers
must agree with a brute-force Python oracle (randomized analog of the
reference's fixed-fixture goldens)."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),           # k1
        st.integers(0, 2),           # k2
        st.sampled_from(["a", "b", "c", None]),  # v
    ),
    min_size=1,
    max_size=25,
)


def _brute_ucc(rows, cols_idx):
    counts = Counter(tuple(r[i] for i in cols_idx) for r in rows)
    n = len(rows)
    nvc = sum(1 for c in counts.values() if c > 1)
    nvr = sum(c for c in counts.values() if c > 1)
    pairs2x = sum(c * (c - 1) for c in counts.values())
    err = pairs2x / (n * (n - 1)) if n > 1 else 0.0
    return n, nvc, nvr, err


def _brute_fd(rows, lhs_idx, rhs_idx):
    clusters: dict = {}
    for r in rows:
        clusters.setdefault(tuple(r[i] for i in lhs_idx), []).append(
            tuple(r[i] for i in rhs_idx)
        )
    n = len(rows)
    nvc = nvr = conflicts = 0
    for vals in clusters.values():
        c = len(vals)
        cnt = Counter(vals)
        eq = sum(k * (k - 1) for k in cnt.values())
        conflicts += c * (c - 1) - eq
        if len(cnt) > 1:
            nvc += 1
            nvr += c
    err = conflicts / (n * n - n) if n > 1 else 0.0
    return n, nvc, nvr, err


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_ucc_matches_bruteforce(spark, rows):
    from desbordante_spark.operators.ucc import ucc_metrics_df

    df = spark.createDataFrame(rows, "k1 int, k2 int, v string")
    m = ucc_metrics_df(df, ["k1", "k2"]).collect()[0]
    n, nvc, nvr, err = _brute_ucc(rows, (0, 1))
    assert (m["total_rows"], m["num_violating_clusters"],
            m["num_violating_rows"]) == (n, nvc, nvr)
    assert m["error"] == pytest.approx(err, abs=1e-12)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_fd_matches_bruteforce(spark, rows):
    from desbordante_spark.operators.fd import fd_metrics_df

    df = spark.createDataFrame(rows, "k1 int, k2 int, v string")
    m = fd_metrics_df(df, ["k1"], ["v"]).collect()[0]
    n, nvc, nvr, err = _brute_fd(rows, (0,), (2,))
    assert (m["total_rows"], m["num_violating_clusters"],
            m["num_violating_rows"]) == (n, nvc, nvr)
    assert m["error"] == pytest.approx(err, abs=1e-12)
