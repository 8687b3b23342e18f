"""Differential-dependency verification goldens + banded-join correctness
(band join must not lose qualifying pairs vs brute force)."""

from __future__ import annotations

from itertools import combinations

import pytest

from desbordante_spark.operators.dd import dd_verify, dd_violations


@pytest.fixture(scope="module")
def salary_df(spark):
    # DD: rows with close ages (|Δage| <= 5) must have close salaries
    # (|Δsalary| <= 1000)
    rows = [
        (0, 30.0, 5000.0),
        (1, 32.0, 5400.0),
        (2, 33.0, 9900.0),   # close in age to 0,1 but salary far -> violations
        (3, 60.0, 5100.0),   # far in age -> unconstrained
        (4, 61.0, 5200.0),
    ]
    return spark.createDataFrame(rows, "rid long, age double, salary double").cache()


def test_dd_violations(salary_df):
    res = dd_verify(
        salary_df, {"age": (0.0, 5.0)}, "salary", 0.0, 1000.0, row_id="rid"
    )
    assert not res.holds
    got = {(r["id_a"], r["id_b"]) for r in res.violations.collect()}
    assert got == {(0, 2), (1, 2)}
    # qualifying pairs: (0,1),(0,2),(1,2),(3,4) -> error 2/4
    assert res.total_rows == 4
    assert res.error == pytest.approx(0.5)


def test_dd_holds(salary_df):
    clean = salary_df.filter("rid <> 2")
    assert dd_verify(
        clean, {"age": (0.0, 5.0)}, "salary", 0.0, 1000.0, row_id="rid"
    ).holds


def test_dd_band_join_matches_bruteforce(spark):
    # random-ish grid; compare banded plan against a python brute force
    rows = [(i, float((i * 7) % 50), float((i * 13) % 200)) for i in range(60)]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    lo, hi, rlo, rhi = 0.0, 4.0, 0.0, 60.0
    got = {
        (r["id_a"], r["id_b"])
        for r in dd_violations(df, {"x": (lo, hi)}, "y", rlo, rhi, "rid").collect()
    }
    expect = set()
    for (ia, xa, ya), (ib, xb, yb) in combinations(rows, 2):
        if lo <= abs(xa - xb) <= hi and not (rlo <= abs(ya - yb) <= rhi):
            expect.add((min(ia, ib), max(ia, ib)))
    assert got == expect


def test_dd_string_distance(spark):
    rows = [(0, "abc", "p1"), (1, "abd", "p1"), (2, "abe", "zz9")]
    df = spark.createDataFrame(rows, "rid long, code string, plan string")
    # codes within 1 edit must have plans within 1 edit
    res = dd_verify(df, {"code": (0.0, 1.0)}, "plan", 0.0, 1.0, row_id="rid")
    got = {(r["id_a"], r["id_b"]) for r in res.violations.collect()}
    assert got == {(0, 2), (1, 2)}
