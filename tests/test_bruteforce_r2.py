"""Brute-force Python cross-checks for the round-2 discovery miners on
seeded random frames — every candidate recomputed independently of the
Spark plans (mirrors the repo's existing brute-force strategy for
verifiers)."""

from __future__ import annotations

import itertools
import random

import pytest


@pytest.fixture(scope="module")
def rnd_rows():
    rng = random.Random(7)
    return [
        (i, rng.randint(0, 3), rng.randint(0, 2), rng.choice("xyz"))
        for i in range(40)
    ]


def test_discover_afds_vs_bruteforce(spark, rnd_rows):
    from desbordante_spark.discovery.pfdtane import discover_afds

    cols = ["a", "b", "s"]
    df = spark.createDataFrame(rnd_rows, "rid int, a int, b int, s string")
    max_error = 0.25

    rows = [r[1:] for r in rnd_rows]  # (a, b, s)
    idx = {c: i for i, c in enumerate(cols)}

    def per_tuple_error(lhs: tuple, rhs: str) -> float:
        clusters: dict = {}
        for r in rows:
            key = tuple(r[idx[c]] for c in lhs)
            clusters.setdefault(key, {}).setdefault(r[idx[rhs]], 0)
            clusters[key][r[idx[rhs]]] += 1
        keep = sum(max(v.values()) for v in clusters.values())
        return 1.0 - keep / len(rows)

    # expected minimal AFDs by definition
    expected = set()
    qualifying = {}
    for rhs in cols:
        for size in (0, 1, 2):
            for lhs in itertools.combinations([c for c in cols if c != rhs],
                                              size):
                if per_tuple_error(lhs, rhs) <= max_error:
                    qualifying.setdefault(rhs, []).append(lhs)
    for rhs, lhss in qualifying.items():
        for lhs in lhss:
            if not any(set(o) < set(lhs) for o in lhss):
                expected.add((lhs, rhs))

    got = {
        (lhs, rhs)
        for lhs, rhs, _err in discover_afds(df, cols, max_lhs=2,
                                            max_error=max_error)
    }
    assert got == expected
    # and the reported errors agree with the brute recomputation
    for lhs, rhs, err in discover_afds(df, cols, max_lhs=2,
                                       max_error=max_error):
        assert err == pytest.approx(per_tuple_error(lhs, rhs))


def test_discover_ods_vs_bruteforce(spark, rnd_rows):
    from desbordante_spark.discovery.order import discover_ods

    df = spark.createDataFrame(rnd_rows, "rid int, a int, b int, s string")
    out = {
        (r["lhs"], r["rhs"], r["direction"]):
            (r["holds"], r["num_swap_groups"])
        for r in discover_ods(df, ["a", "b"], context=[]).collect()
    }
    rows = [(r[1], r[2]) for r in rnd_rows]  # (a, b)

    def brute(lhs_i, rhs_i, desc):
        groups: dict = {}
        for r in rows:
            groups.setdefault(r[lhs_i], []).append(
                -r[rhs_i] if desc else r[rhs_i]
            )
        swaps = 0
        prev_max = None
        for k in sorted(groups):
            if prev_max is not None and prev_max > min(groups[k]):
                swaps += 1
            m = max(groups[k])
            prev_max = m if prev_max is None else max(prev_max, m)
        return swaps

    for (lhs, rhs, d), (holds, nsw) in out.items():
        li, ri = {"a": 0, "b": 1}[lhs], {"a": 0, "b": 1}[rhs]
        expect = brute(li, ri, d == "desc")
        assert nsw == expect, (lhs, rhs, d)
        assert holds == int(expect == 0)


def test_mind_vs_bruteforce(spark):
    from desbordante_spark.discovery.mind import discover_nary_inds

    rng = random.Random(11)
    t1 = [(rng.randint(0, 4), rng.choice("pq")) for _ in range(15)]
    t2 = [(rng.randint(0, 6), rng.choice("pqr")) for _ in range(30)]
    a = spark.createDataFrame(t1, "k int, s string")
    b = spark.createDataFrame(t2, "k int, s string")
    got = {
        (r["lhs"], r["rhs"])
        for r in discover_nary_inds({"a": a, "b": b}, max_arity=2).collect()
    }

    def incl(lvals, rvals):
        return set(lvals) <= set(rvals)

    expected = set()
    for lt, lrows, rt, rrows in (("a", t1, "b", t2), ("b", t2, "a", t1)):
        for li, lc in enumerate(("k", "s")):
            for ri, rc in enumerate(("k", "s")):
                if incl([str(r[li]) for r in lrows],
                        [str(r[ri]) for r in rrows]):
                    expected.add((f"{lt}[{lc}]", f"{rt}[{rc}]"))
        # binary: both column orders, distinct cols each side
        for (l1, l2) in (((0, "k"), (1, "s")),):
            for rperm in (((0, "k"), (1, "s")), ((1, "s"), (0, "k"))):
                lv = [(str(r[l1[0]]), str(r[l2[0]])) for r in lrows]
                rv = [(str(r[rperm[0][0]]), str(r[rperm[1][0]]))
                      for r in rrows]
                if incl(lv, rv):
                    expected.add((
                        f"{lt}[{l1[1]},{l2[1]}]",
                        f"{rt}[{rperm[0][1]},{rperm[1][1]}]",
                    ))
    assert got == expected
