"""Round-6 fixes: ADVICE findings (compat fd.Pyro error kwargs pass-through,
pairwise agree-set empty-mask invariant) and VERDICT items (wide='pairwise'
default so the agree-set miners run out of the box on 18+-column tables,
combined all-miners driver entries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------- compat fd.Pyro honors error kwargs

def test_compat_fd_pyro_honors_error_kwarg(spark):
    """ADVICE compat.py:196 — fd.algorithms.Pyro is the same bound class as
    afd.algorithms.Pyro in the reference (bind_fd.cpp BindPrimitive), so
    execute(error=0.3) must yield AFDs, not silently-exact FDs."""
    import pandas as pd

    from desbordante_spark.compat import fd as compat_fd

    # k -> v is NOT exact (one dirty row) but holds at g1 <= 0.3, while
    # [] -> v fails even at 0.3 (v is diverse overall) so [k] -> v is the
    # minimal AFD the approximate run must surface
    rows = [(i % 5, f"V{i % 5}" if i != 19 else "V9") for i in range(20)]
    df = pd.DataFrame(rows, columns=["k", "v"])

    exact = compat_fd.algorithms.Pyro()
    exact.load_data(table=df)
    exact.execute()
    exact_set = {str(f) for f in exact.get_fds()}

    approx = compat_fd.algorithms.Pyro()
    approx.load_data(table=df)
    approx.execute(error=0.3)
    approx_set = {str(f) for f in approx.get_fds()}

    # at error=0 the near-FD [k] -> v is refuted by the one dirty row;
    # at error=0.3 it must appear
    assert any("[k] -> v" in s for s in approx_set)
    assert not any("[k] -> v" in s for s in exact_set)
    assert approx_set != exact_set


def test_compat_fd_pyro_default_still_exact(spark, testfd):
    """Without kwargs, fd.Pyro stays exact minimal-FD discovery equal to
    the levelwise miner."""
    from desbordante_spark.compat import fd as compat_fd
    from desbordante_spark.discovery.tane import discover_fds

    pdf = testfd.toPandas()
    algo = compat_fd.algorithms.Pyro()
    algo.load_data(table=pdf)
    algo.execute(max_lhs=2)
    got = {(tuple(f.lhs_indices), f.rhs_index) for f in algo.get_fds()}
    cols = list(pdf.columns)
    want = {
        (tuple(sorted(cols.index(c) for c in lhs)), cols.index(rhs))
        for lhs, rhs in discover_fds(testfd, max_lhs=2)
    }
    assert got == want


# --------------------------- pairwise factory: no empty agree-set entries

def test_pairwise_factory_omits_empty_agree_sets(spark):
    """ADVICE fdep.py:198 — an xxhash64 cluster collision between unequal
    values may produce a candidate pair with exact mask 0; the documented
    invariant is that such pairs are OMITTED (consumers recover them from
    covered < n*(n-1)/2). Simulate by checking the contract directly on a
    table where some pairs agree on nothing."""
    from desbordante_spark.discovery.fdep import (
        compute_agree_sets,
        compute_agree_sets_pairwise,
    )

    rows = [("a", 1), ("a", 2), ("b", 3), ("c", 4)]
    df = spark.createDataFrame(rows, "x string, y int")
    got, n = compute_agree_sets_pairwise(df)
    assert n == 4
    assert all(len(aset) > 0 for aset, _cnt in got)
    want, _ = compute_agree_sets(df)
    assert got == want


# ------------------------------ wide tables run out of the box (pairwise)

def test_agree_set_miners_default_pairwise_on_wide_table(spark):
    """VERDICT #7 — wide='pairwise' is now the default: FDep/FastFDs/
    Depminer run on an 18+-column table without opting in, and agree with
    the levelwise miner."""
    from desbordante_spark.discovery.depminer import discover_fds_depminer
    from desbordante_spark.discovery.fastfds import discover_fds_fastfds
    from desbordante_spark.discovery.fdep import discover_fds_fdep
    from desbordante_spark.discovery.tane import discover_fds

    m = 18
    # c0 determines everything; c1..c5 cycle; rest are near-constant
    rows = [
        tuple([i] + [i % 3 if j <= 5 else j for j in range(1, m)])
        for i in range(12)
    ]
    schema = ", ".join(f"c{j} int" for j in range(m))
    df = spark.createDataFrame(rows, schema)
    want = discover_fds(df, max_lhs=1)
    for miner in (
        discover_fds_fdep,
        discover_fds_fastfds,
        discover_fds_depminer,
    ):
        assert miner(df, max_lhs=1) == want, miner.__name__


def test_agree_set_cover_budget_guard_still_raises(spark):
    """Past pair_budget the pairwise path must still hard-fail with the
    hybrid-miner hint."""
    from desbordante_spark.discovery.fdep import discover_fds_fdep

    rows = [tuple(1 for _ in range(18)) for _ in range(60)]
    schema = ", ".join(f"c{j} int" for j in range(18))
    df = spark.createDataFrame(rows, schema)
    with pytest.raises(ValueError, match="pair_budget"):
        discover_fds_fdep(df, pair_budget=100)


def test_fdmine_runs_at_18_columns(spark):
    """FD_Mine's static width guard is now 24 (driver lattice is key/
    equivalence-pruned; masks are Python big-ints) so 18 columns work."""
    from desbordante_spark.discovery.fd_mine import (
        discover_fds_fdmine_minimized,
    )
    from desbordante_spark.discovery.tane import discover_fds

    m = 18
    rows = [
        tuple([i] + [i % 3 if j <= 3 else 7 for j in range(1, m)])
        for i in range(9)
    ]
    schema = ", ".join(f"c{j} int" for j in range(m))
    df = spark.createDataFrame(rows, schema)
    got = discover_fds_fdmine_minimized(df, max_lhs=1)
    assert got == discover_fds(df, max_lhs=1)


# ----------------------------------- combined driver entries stay coherent

def test_combined_driver_entries_match_components(spark):
    """The combined fd/ucc all-miners driver rows must equal the union of
    the per-miner entries (same data, an algorithm label per row)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry6", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sf = "/root/testdata/sf0.001"
    qs = mod.queries()

    combined = {
        (r["algorithm"], r["lhs"], r["rhs"])
        for r in qs["fd_discovery_all_miners_orders"](spark, sf).collect()
    }
    base = {
        (r["lhs"], r["rhs"])
        for r in qs["fd_discovery_orders"](spark, sf).collect()
    }
    assert combined == {
        (alg, lhs, rhs)
        for alg in mod._FD_MINER_NAMES
        for lhs, rhs in base
    }

    ucc_combined = {
        (r["algorithm"], r["ucc"])
        for r in qs["ucc_discovery_all_orders"](spark, sf).collect()
    }
    ucc_base = {
        r["ucc"] for r in qs["ucc_discovery_orders"](spark, sf).collect()
    }
    assert ucc_combined == {
        (alg, u) for alg in ("tane", "hyucc") for u in ucc_base
    }

    # the driver records exactly the first 50 entries: every entry must
    # have an oracle, and the first 50 must include one row per family
    keys = list(qs)
    assert len(keys) >= 50
    assert set(mod.oracle_sql()) >= set(keys)
    first50 = set(keys[:50])
    for must in (
        "fd_discovery_all_miners_orders",
        "ucc_discovery_all_orders",
        "afd_discovery_pyro_orders",
        "aucc_discovery_orders",
        "ind_discovery_nary_approx",
        "ind_discovery_aind_nulls",
        "near_dup_minhash_documents",
        "typo_candidates_cities",
        "typed_rank_mixedfmt",
        "gfd_dot_directors",
        "dd_discovery_supplier",
        "cfd_discovery_orders",
    ):
        assert must in first50, must
