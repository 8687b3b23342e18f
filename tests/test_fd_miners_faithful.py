"""Faithful FastFDs / Depminer / FD_Mine conformance.

Round 4 converted Pyro, HyUCC and FASTOD from documented standins into
faithful searches; this module does the same for the last three FD miners:

- FastFDs (fastfds.py): difference-set minimal-cover DFS — reference
  fastfds.cpp:107-143, hash-pinned with every other FD miner
  (src/tests/test_fd_algorithm.cpp:160).
- Depminer (depminer.py): maximal agree sets → CMAX → levelwise
  hitting-set candidates — reference depminer.cpp:55-152, hash-pinned too.
- FD_Mine (fd_mine.py): levelwise closures + equivalence pruning +
  reconstruction — reference fd_mine.cpp. NOT hash-pinned: its raw output
  is non-minimized by design, and the reference's own test
  (src/tests/test_fd_mine.cpp:139-186) compares the minimized,
  constant-substituted list with Pyro. Replayed here the same way.
"""

from __future__ import annotations

import pytest

from tests.test_reference_hash_golden import (
    FD_GOLD,
    fds_to_json,
    fletcher16,
    load,
)


def _df(spark, rows, ncols):
    cols = [f"c{i}" for i in range(ncols)]
    return spark.createDataFrame(
        [tuple(str(v) for v in r) for r in rows],
        ", ".join(f"{c} string" for c in cols),
    )


# ---- output identity with the levelwise miner ----------------------------

FIXTURE = [
    # c0 key-ish, c1 = c0 mod 3, c2 constant-ish, c3 free
    (i, i % 3, "k", i * 7 % 5) for i in range(30)
] + [(100, 0, "k", 9), (100, 0, "k", 9)]


@pytest.mark.parametrize("miner_name", ["fastfds", "depminer"])
def test_new_miners_match_tane(spark, miner_name):
    from desbordante_spark.discovery.tane import discover_fds

    if miner_name == "fastfds":
        from desbordante_spark.discovery.fastfds import (
            discover_fds_fastfds as miner,
        )
    else:
        from desbordante_spark.discovery.depminer import (
            discover_fds_depminer as miner,
        )

    df = _df(spark, FIXTURE, 4)
    stats: dict = {}
    got = miner(df, max_lhs=3, stats=stats)
    want = sorted(discover_fds(df, max_lhs=3))
    assert got == want
    assert stats  # search evidence populated


def test_new_miners_match_tane_on_testfd(spark, testfd):
    from desbordante_spark.discovery.depminer import discover_fds_depminer
    from desbordante_spark.discovery.fastfds import discover_fds_fastfds
    from desbordante_spark.discovery.tane import discover_fds

    df = testfd.drop("row_id")
    want = sorted(discover_fds(df, max_lhs=5))
    assert discover_fds_fastfds(df, max_lhs=5) == want
    assert discover_fds_depminer(df, max_lhs=5) == want


def test_fastfds_search_shape(spark):
    """The DFS rejects non-minimal leaves (the paper's 'wasted effort')
    and visits a bounded node count — evidence the cover search ran, not
    a re-labelled inversion."""
    from desbordante_spark.discovery.fastfds import discover_fds_fastfds

    df = _df(spark, FIXTURE, 4)
    stats: dict = {}
    discover_fds_fastfds(df, max_lhs=3, stats=stats)
    assert stats["nodes"] > 0
    assert stats["diff_sets"] >= 1


def test_depminer_search_shape(spark):
    from desbordante_spark.discovery.depminer import discover_fds_depminer

    df = _df(spark, FIXTURE, 4)
    stats: dict = {}
    discover_fds_depminer(df, max_lhs=3, stats=stats)
    assert stats["cmax_combinations"] >= 1
    assert stats["candidates_checked"] >= 1


# ---- reference golden hashes (FastFDs/Depminer are hash-pinned) ----------

@pytest.mark.parametrize("miner_name", ["fastfds", "depminer"])
def test_reference_fletcher_hashes(spark, miner_name):
    """test_fd_algorithm.cpp pins FastFDs and Depminer to the same
    Fletcher16 result hashes as every other FD miner — replay all light
    datasets through the faithful searches."""
    if miner_name == "fastfds":
        from desbordante_spark.discovery.fastfds import (
            discover_fds_fastfds as miner,
        )
    else:
        from desbordante_spark.discovery.depminer import (
            discover_fds_depminer as miner,
        )

    for name, want in FD_GOLD.items():
        df, cols = load(spark, name)
        pos = {c: i for i, c in enumerate(cols)}
        fds = miner(df, columns=cols, max_lhs=len(cols) - 1)
        got = fletcher16(fds_to_json(fds, pos))
        assert got == want, (name, len(fds))


# ---- FD_Mine (reference test_fd_mine.cpp semantics) ----------------------

def test_fdmine_long_dataset(spark):
    """FD_Mine_WorksOnLongDataset (test_fd_mine.cpp:91-98): the raw
    FdList on TestLong.csv is exactly {2} -> 1."""
    from desbordante_spark.discovery.fd_mine import discover_fds_fdmine

    df, cols = load(spark, "TestLong")
    raw = discover_fds_fdmine(df, columns=cols)
    assert raw == [(("c2",), "c1")]


def test_fdmine_single_non_key_empty(spark):
    """FD_Mine_ReturnsEmptyOnSingleNonKey (test_fd_mine.cpp:85-89)."""
    from desbordante_spark.discovery.fd_mine import discover_fds_fdmine

    df = _df(spark, [(1,), (2,), (2,)], 1)
    assert discover_fds_fdmine(df) == []


def test_fdmine_minimized_equals_pyro_contract(spark):
    """FD_Mine_ReturnsSameAsPyro (test_fd_mine.cpp:139-186): the
    minimized, constant-substituted FD_Mine list equals the minimal
    miner's output — replayed on the light datasets and checked against
    the pinned Fletcher16 hashes."""
    from desbordante_spark.discovery.fd_mine import (
        discover_fds_fdmine_minimized,
    )

    for name, want in FD_GOLD.items():
        df, cols = load(spark, name)
        pos = {c: i for i, c in enumerate(cols)}
        stats: dict = {}
        fds = discover_fds_fdmine_minimized(df, columns=cols, stats=stats)
        got = fletcher16(fds_to_json(fds, pos))
        assert got == want, (name, len(fds))
        assert stats["jobs"] >= 2  # batched closure counting ran


def test_fdmine_raw_output_not_minimal_by_design(spark, testfd):
    """The raw FdList keeps closure-implied (non-minimal) rules — that is
    the reference behavior the minimizing test exists FOR; assert the gap
    is real on TestFD so the minimized path is load-bearing."""
    from desbordante_spark.discovery.fd_mine import (
        discover_fds_fdmine,
        discover_fds_fdmine_minimized,
    )
    from desbordante_spark.discovery.tane import discover_fds

    df = testfd.drop("row_id")
    raw = discover_fds_fdmine(df)
    minimized = discover_fds_fdmine_minimized(df)
    want = sorted(discover_fds(df, max_lhs=len(df.columns) - 1))
    assert minimized == want
    assert len(raw) >= len(minimized)


# ---- degenerate inputs ----------------------------------------------------

def test_edge_inputs_match_tane(spark):
    """Empty / single-row / null-bearing frames: both new miners follow
    the engine convention (tane). All-rows-IDENTICAL is the one documented
    divergence: the reference FastFDs returns NOTHING there (its empty
    difference set short-circuits, fastfds.cpp:53-57) while Depminer's
    constant check fires — both reproduced."""
    from pyspark.sql.types import StringType, StructField, StructType

    from desbordante_spark.discovery.depminer import discover_fds_depminer
    from desbordante_spark.discovery.fastfds import discover_fds_fastfds
    from desbordante_spark.discovery.tane import discover_fds

    schema = StructType(
        [StructField(c, StringType()) for c in ("a", "b", "c")]
    )
    cases = {
        "empty": [],
        "single": [("1", "2", "3")],
        "nulls": [("1", None, "3"), ("1", None, "3"), ("2", "x", None),
                  ("2", "y", None), (None, "x", "z")],
    }
    for name, rows in cases.items():
        df = spark.createDataFrame(rows, schema)
        want = sorted(discover_fds(df, max_lhs=2))
        assert discover_fds_fastfds(df, max_lhs=2) == want, name
        assert discover_fds_depminer(df, max_lhs=2) == want, name
    ident = spark.createDataFrame([("1", "2", "3")] * 4, schema)
    assert discover_fds_fastfds(ident, max_lhs=2) == []  # fastfds.cpp:53-57
    assert discover_fds_depminer(ident, max_lhs=2) == sorted(
        discover_fds(ident, max_lhs=2)
    )


# ---- wide tables: pair-stream agree-set factory ---------------------------

def test_pairwise_cover_equals_counting_factory(spark):
    """On a narrow table both exact factories must return the identical
    cover — same agree sets, same exact pair counts."""
    from desbordante_spark.discovery.fdep import (
        compute_agree_sets,
        compute_agree_sets_pairwise,
    )

    df = _df(spark, FIXTURE, 4)
    want, n1 = compute_agree_sets(df)
    stats: dict = {}
    got, n2 = compute_agree_sets_pairwise(df, stats=stats)
    assert n1 == n2
    assert sorted(want) == sorted(got)
    assert stats["pair_mass"] >= sum(c for _a, c in got)


def test_pairwise_budget_guard(spark):
    from desbordante_spark.discovery.fdep import (
        compute_agree_sets_pairwise,
    )

    df = _df(spark, FIXTURE, 4)
    with pytest.raises(ValueError, match="pair_budget"):
        compute_agree_sets_pairwise(df, pair_budget=3)


def test_max_lhs_parity_wide_dataset(spark):
    """MaxLHSOptionWork (test_fd_algorithm.cpp:142-152): FastFDs and
    Depminer with max_lhs=2 must equal the exact levelwise miner on
    CIPublicHighway700 — 18 columns, past the counting factory's lattice
    budget, exercised through the pair-stream factory."""
    from desbordante_spark.discovery.depminer import discover_fds_depminer
    from desbordante_spark.discovery.fastfds import discover_fds_fastfds
    from desbordante_spark.discovery.tane import discover_fds

    df, cols = load(spark, "CIPublicHighway700")
    want = sorted(discover_fds(df, columns=cols, max_lhs=2))
    got_ff = discover_fds_fastfds(
        df, columns=cols, max_lhs=2, wide="pairwise"
    )
    got_dm = discover_fds_depminer(
        df, columns=cols, max_lhs=2, wide="pairwise"
    )
    assert got_ff == want
    assert got_dm == want
    assert all(len(lhs) <= 2 for lhs, _ in got_ff)


def test_fdmine_compat_surface(spark, testfd):
    """compat FdMine exposes the raw reference FdList."""
    from desbordante_spark import compat

    algo = compat.fd.algorithms.FdMine()
    algo.load_data(table=testfd.drop("row_id"))
    algo.execute()
    fds = algo.get_fds()
    assert fds  # non-empty on TestFD


# ---- pip-binding surface parity -------------------------------------------

def test_compat_surface_covers_reference_bindings():
    """Every algorithm class the reference's python bindings export
    (src/python_bindings/{fd,ucc,ind,od,cfd,ar,ac,dd}/bind_*.cpp) exists
    on the compat surface under the same module path."""
    import desbordante_spark.compat as d

    surface = {
        "fd": ["HyFD", "Aid", "Depminer", "DFD", "FastFDs", "FDep",
               "FdMine", "FUN", "Pyro", "Tane", "PFDTane"],
        "afd": ["Pyro", "Tane"],
        "pfd": ["PFDTane"],
        "ucc": ["HyUCC", "PyroUCC"],
        "ind": ["Spider", "Faida", "Mind"],
        "aind": ["Spider", "Mind"],
        "od": ["Fastod", "Order"],
        "cfd": ["FDFirst"],
        "ar": ["Apriori"],
        "dd": ["Split"],
        "fd_verification": ["FDVerifier"],
        "afd_verification": ["FDVerifier"],
        "ucc_verification": ["UccVerifier"],
        "aucc_verification": ["UccVerifier"],
        "mfd_verification": ["MetricVerifier"],
        "gfd_verification": ["GfdValid", "EGfdValid", "NaiveGfdValid"],
    }
    for mod, classes in surface.items():
        algos = getattr(d, mod).algorithms
        for cls in classes + ["Default"]:
            assert hasattr(algos, cls), f"{mod}.algorithms.{cls}"


def test_compat_fd_pyro_and_pfdtane(spark, testfd):
    """fd.algorithms.Pyro at error=0 and PFDTane at error=0 both return
    the exact minimal-FD set (reference: all FD miners pinned to one
    result)."""
    import desbordante_spark.compat as d

    df = testfd.drop("row_id")
    want = {str(fd) for fd in
            d.fd.algorithms.Tane().load_data(table=df).execute(
                max_lhs=2).get_fds()}
    for cls in (d.fd.algorithms.Pyro, d.fd.algorithms.PFDTane):
        got = {str(fd) for fd in
               cls().load_data(table=df).execute(max_lhs=2).get_fds()}
        assert got == want, cls.__name__


def test_compat_mind_faida_nary(spark):
    """ind.algorithms.Mind (exact n-ary) and Faida (sketch-pruned) agree
    on a small frame; aind.algorithms drives Spider/Mind with error."""
    import desbordante_spark.compat as d

    t1 = spark.createDataFrame(
        [("a", "1"), ("b", "2")], "x string, y string"
    )
    t2 = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], "u string, v string"
    )
    kinds = {}
    for name, cls in (("mind", d.ind.algorithms.Mind),
                      ("faida", d.ind.algorithms.Faida)):
        algo = cls()
        algo._tables = {"t1": t1, "t2": t2}
        algo.execute(max_arity=2)
        kinds[name] = sorted((r["lhs"], r["rhs"]) for r in algo.get_inds())
    assert kinds["mind"] == kinds["faida"]
    assert ("t1[x,y]", "t2[u,v]") in kinds["mind"]
    assert d.aind.algorithms.Default is d.aind.algorithms.Spider
