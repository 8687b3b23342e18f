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


def _brute_min_auccs(rows, col_idx, max_size, max_error):
    """All minimal column sets (by index, names assumed in index order)
    whose equal-pair error <= max_error, exactly the miners' contract."""
    from itertools import combinations

    n = len(rows)

    def err(idx):
        counts = Counter(tuple(r[i] for i in idx) for r in rows)
        p2x = sum(c * (c - 1) for c in counts.values())
        return p2x / (n * (n - 1)) if n > 1 else 0.0

    qualifying = []
    for size in range(1, max_size + 1):
        for idx in combinations(col_idx, size):
            if any(set(q) <= set(idx) for q, _ in qualifying):
                continue
            e = err(idx)
            if e <= max_error:
                qualifying.append((idx, e))
    return sorted(qualifying)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy,
       max_error=st.sampled_from([0.0, 0.05, 0.2, 0.5]))
def test_aucc_miners_match_bruteforce(spark, rows, max_error):
    """Levelwise AUCC enumeration, the faithful PyroUCC traversal, and a
    brute-force Python oracle agree on minimal sets AND exact errors for
    random small tables at random thresholds (null-safe keys: nulls
    agree, like the miners' group_key)."""
    from desbordante_spark.discovery.aucc import (
        discover_auccs,
        discover_auccs_pyro,
    )

    df = spark.createDataFrame(rows, "c1 int, c2 int, c3 string")
    level = discover_auccs(df, max_size=3, max_error=max_error)
    pyro = discover_auccs_pyro(df, max_size=3, max_error=max_error)
    assert level == pyro
    names = ["c1", "c2", "c3"]
    want = [
        (tuple(names[i] for i in idx), e)
        for idx, e in _brute_min_auccs(rows, (0, 1, 2), 3, max_error)
    ]
    assert [s for s, _ in level] == [s for s, _ in want]
    for (_, got_e), (_, want_e) in zip(level, want):
        assert got_e == pytest.approx(want_e, abs=1e-12)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(
           st.tuples(
               st.integers(0, 2),                     # partition 0..2
               st.one_of(st.none(),
                         st.integers(-20, 20)),       # numeric value
               st.sampled_from(["a", "b", None]),     # discrete value
           ),
           min_size=1, max_size=30,
       ),
       cut=st.integers(0, 29))
def test_hist_state_incremental_matches_full_and_bruteforce(
    spark, rows, cut
):
    """For a random frame and a random base/delta split, the incrementally
    folded histogram state equals both a one-shot init and a brute-force
    Python bucket count (fixed-width AND discrete rules)."""
    from desbordante_spark.operators.profile_state import (
        hist_apply_incremental,
        hist_state_init,
    )

    specs = {"x": 5.0, "s": "discrete"}
    data = [(f"p{p}", x, s) for p, x, s in rows]
    df = spark.createDataFrame(data, "part_key string, x long, s string")
    cut = min(cut, len(data))
    base, delta = data[:cut], data[cut:]
    mk = lambda d: spark.createDataFrame(  # noqa: E731
        d, "part_key string, x long, s string"
    )
    st_full = hist_state_init(df, specs)
    if base and delta:
        st_inc = hist_apply_incremental(
            hist_state_init(mk(base), specs), mk(delta), specs
        )
    else:
        st_inc = st_full
    got_full = sorted(map(tuple, st_full.collect()))
    got_inc = sorted(map(tuple, st_inc.collect()))
    want = Counter()
    for p, x, s in data:
        if x is not None:
            want[(p, "x", str(x // 5))] += 1
        if s is not None:
            want[(p, "s", s)] += 1
    brute = sorted((p, c, b, n) for (p, c, b), n in want.items())
    assert got_full == brute
    assert got_inc == brute
