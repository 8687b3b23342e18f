"""Mergeable profile state (operators/profile_state): incremental ≡ full
for every exact field, HLL distinct within the sketch's error bound, and
the untouched-partition pass-through never recomputes carried sketches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from desbordante_spark.operators.profile_state import (
    profile_apply_incremental,
    profile_from_state,
    profile_state_init,
    profile_state_merge,
)


def _frame(spark, n, part_mod=4, start=0):
    rows = [
        (
            f"p{i % part_mod}",
            i,
            None if i % 7 == 0 else ("" if i % 11 == 0 else f"v{i % 61}"),
            float(i) * 0.5 if i % 5 else None,
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(
        rows, "part_key string, k long, s string, x double"
    )


EXACT_FIELDS = [
    "n_rows", "null_count", "empty_count", "count_values",
    "min_num", "max_num", "sum_num", "min_str", "max_str",
]


def _rollup(state, per_partition=False):
    df = profile_from_state(state, per_partition=per_partition)
    keys = ["partition", "column"] if per_partition else ["column"]
    exact = {
        tuple(r[k] for k in keys): tuple(r[f] for f in EXACT_FIELDS)
        for r in df.collect()
    }
    approx = {
        tuple(r[k] for k in keys): r["distinct_approx"]
        for r in df.collect()
    }
    return exact, approx


def test_incremental_equals_full(spark):
    """Chain of two deltas vs one full init: exact fields bit-for-bit,
    distinct estimates within the lgK=12 error bound (the module
    docstring explains why estimates are not bit-stable across merge
    topologies)."""
    base = _frame(spark, 3000)
    d1 = _frame(spark, 500, part_mod=1, start=100_000)   # touches p0 only
    d2 = _frame(spark, 400, part_mod=2, start=200_000)   # touches p0, p1

    st = profile_state_init(base)
    st = profile_apply_incremental(st, d1)
    st = profile_apply_incremental(st, d2)
    full = profile_state_init(base.unionByName(d1).unionByName(d2))

    for per_partition in (False, True):
        inc_exact, inc_approx = _rollup(st, per_partition)
        ful_exact, ful_approx = _rollup(full, per_partition)
        assert inc_exact == ful_exact
        for k in ful_approx:
            a, b = inc_approx[k], ful_approx[k]
            assert abs(a - b) <= max(4, 0.05 * b), (k, a, b)


def test_distinct_estimate_tracks_exact(spark):
    """The merged-sketch estimate lands within ~5% of the true distinct
    count (lgK=12 RSE ≈ 1.6%)."""
    df = _frame(spark, 8000)
    _, approx = _rollup(profile_state_init(df))
    for col, vv in (
        ("k", F.col("k")),
        ("s", F.when(F.col("s") != "", F.col("s"))),
    ):
        exact = df.select(vv.alias("v")).na.drop().distinct().count()
        est = approx[(col,)]
        assert abs(est - exact) <= max(4, 0.05 * exact), (col, est, exact)


def test_untouched_partitions_carry_through_by_antijoin(spark):
    """A delta touching one partition leaves every other partition's state
    ROWS identical (same objects, no re-aggregation path): compare the
    carried slice of the new state with the old state's slice."""
    base = _frame(spark, 2000)
    delta = _frame(spark, 300, part_mod=1, start=50_000)  # p0 only
    st0 = profile_state_init(base).localCheckpoint(eager=True)
    st1 = profile_apply_incremental(st0, delta)

    old_rest = st0.filter(F.col("partition") != "p0")
    new_rest = st1.filter(F.col("partition") != "p0")
    # sketches are binary — compare via estimate + exact fields
    cols = ["partition", "column", "n_rows", "null_count", "empty_count",
            "min_num", "max_num", "sum_num", "min_str", "max_str"]
    key = lambda r: (r["partition"], r["column"])  # noqa: E731
    a = sorted(
        old_rest.select(*cols, F.hll_sketch_estimate("hll").alias("d"))
        .collect(), key=key,
    )
    b = sorted(
        new_rest.select(*cols, F.hll_sketch_estimate("hll").alias("d"))
        .collect(), key=key,
    )
    assert a == b
    # and the touched partition changed
    assert (
        st1.filter(F.col("partition") == "p0")
        .agg(F.sum("n_rows")).collect()[0][0]
        > st0.filter(F.col("partition") == "p0")
        .agg(F.sum("n_rows")).collect()[0][0]
    )


def test_merge_commutative(spark):
    """profile_state_merge(a, b) ≡ profile_state_merge(b, a) on exact
    fields; estimates agree within the sketch error (DataSketches union
    estimates are order-sensitive by a fraction of the RSE — module
    docstring)."""
    a = profile_state_init(_frame(spark, 1200))
    b = profile_state_init(_frame(spark, 800, start=30_000))
    ab_exact, ab_approx = _rollup(profile_state_merge(a, b), True)
    ba_exact, ba_approx = _rollup(profile_state_merge(b, a), True)
    assert ab_exact == ba_exact
    for k in ab_approx:
        assert abs(ab_approx[k] - ba_approx[k]) <= max(
            4, 0.05 * ba_approx[k]
        ), (k, ab_approx[k], ba_approx[k])


def test_empty_and_all_null_columns(spark):
    """A column that is entirely null/empty still produces a state row with
    zero valid values and estimate 0."""
    df = spark.createDataFrame(
        [("p0", None, ""), ("p0", None, ""), ("p1", None, None)],
        "part_key string, s string, t string",
    )
    exact, approx = _rollup(profile_state_init(df))
    assert exact[("s",)][:4] == (3, 3, 0, 0)   # n_rows, nulls, empties, valid
    assert exact[("t",)][:4] == (3, 1, 2, 0)
    assert approx[("s",)] == 0 and approx[("t",)] == 0


def test_state_survives_parquet_roundtrip(spark, tmp_path):
    """The state (binary sketch column included) persists as plain parquet
    and keeps merging after a read-back — the checkpoint story."""
    base = _frame(spark, 1500)
    delta = _frame(spark, 200, part_mod=2, start=70_000)
    st0 = profile_state_init(base)
    p = str(tmp_path / "profile_state")
    st0.write.mode("overwrite").parquet(p)
    st0_back = spark.read.parquet(p)
    st1 = profile_apply_incremental(st0_back, delta)
    full = profile_state_init(base.unionByName(delta))
    inc_exact, _ = _rollup(st1)
    ful_exact, _ = _rollup(full)
    assert inc_exact == ful_exact


SPECS = {"x": 2.0, "s": "discrete"}


def _hist_rows(state):
    return sorted(
        (r["partition"], r["column"], r["bucket"], r["cnt"])
        for r in state.collect()
    )


def test_hist_incremental_equals_full(spark):
    """Histogram state is exact: a chain of two deltas equals one full init
    bit-for-bit (counts merge by +)."""
    from desbordante_spark.operators.profile_state import (
        hist_apply_incremental,
        hist_state_init,
    )

    base = _frame(spark, 3000)
    d1 = _frame(spark, 500, part_mod=1, start=100_000)
    d2 = _frame(spark, 400, part_mod=2, start=200_000)
    st = hist_state_init(base, SPECS)
    st = hist_apply_incremental(st, d1, SPECS)
    st = hist_apply_incremental(st, d2, SPECS)
    full = hist_state_init(base.unionByName(d1).unionByName(d2), SPECS)
    assert _hist_rows(st) == _hist_rows(full)


def test_hist_untouched_partitions_carry_through(spark):
    """A delta touching only p0 leaves every other partition's histogram
    rows identical (anti-join pass-through) and changes p0's."""
    from desbordante_spark.operators.profile_state import (
        hist_apply_incremental,
        hist_state_init,
    )

    base = _frame(spark, 2000)
    delta = _frame(spark, 300, part_mod=1, start=50_000)  # p0 only
    st0 = hist_state_init(base, SPECS).localCheckpoint(eager=True)
    st1 = hist_apply_incremental(st0, delta, SPECS)
    rest = lambda st: [  # noqa: E731
        t for t in _hist_rows(st) if t[0] != "p0"
    ]
    assert rest(st0) == rest(st1)
    tot = lambda st: sum(  # noqa: E731
        t[3] for t in _hist_rows(st) if t[0] == "p0"
    )
    assert tot(st1) > tot(st0)


def test_drift_from_state_matches_direct(spark):
    """drift_from_state over an incrementally maintained histogram state
    equals drift_metrics(histogram_sketch(full_table)) row-for-row, for
    both the fixed-width and the discrete bucket rule."""
    from desbordante_spark.operators.drift import (
        drift_metrics,
        histogram_sketch,
    )
    from desbordante_spark.operators.profile_state import (
        drift_from_state,
        hist_apply_incremental,
        hist_state_init,
    )

    base = _frame(spark, 2500)
    delta = _frame(spark, 600, part_mod=2, start=90_000)
    full = base.unionByName(delta)
    st = hist_state_init(base, SPECS)
    st = hist_apply_incremental(st, delta, SPECS)

    for col, kw in (("x", {"bucket_width": 2.0}), ("s", {"discrete": True})):
        got = sorted(
            tuple(r) for r in drift_from_state(st, col).collect()
        )
        want = sorted(
            tuple(r)
            for r in drift_metrics(
                histogram_sketch(full, col, "part_key", **kw)
            ).collect()
        )
        assert got == want, col


def test_hist_requires_specs(spark):
    from desbordante_spark.operators.profile_state import hist_state_init

    with pytest.raises(ValueError, match="at least one column"):
        hist_state_init(_frame(spark, 10), {})


def test_no_delta_noop_columns_param(spark):
    """columns= restricts the profiled set; the partition column itself is
    never profiled."""
    df = _frame(spark, 500)
    st = profile_state_init(df, columns=["k", "s"])
    got = {r["column"] for r in st.select("column").distinct().collect()}
    assert got == {"k", "s"}
