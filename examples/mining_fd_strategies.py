"""FD discovery, eight strategies, one answer — mirrors the reference's
algorithm selection surface (`algorithm_types.h:23-80`: tane / hyfd / dfd /
fdep / fun / fastfds / depminer / fd_mine all mine the same minimal-FD set
by different routes):

- TANE       levelwise lattice, one batched distinct-count job per level
- HyFD       sampled negative cover + batched validation of survivors
- FDep       complete agree-set cover by counting + driver inversion
- DFD        lockstep random walks with subset/superset inference
- FUN        free-set lattice, node-level count pruning, Expand-free jobs
- FastFDs    difference-set minimal-cover DFS, coverage-ordered branching
- Depminer   maximal agree sets -> CMAX complements -> levelwise hitting sets
- FD_Mine    levelwise closures + equivalence pruning (raw output is
             non-minimized by design; compared here through the
             reference-test minimization, test_fd_mine.cpp:139-186)

All eight are exact and must agree bit-for-bit."""

from __future__ import annotations

from desbordante_spark.discovery.depminer import discover_fds_depminer
from desbordante_spark.discovery.dfd import discover_fds_dfd
from desbordante_spark.discovery.fastfds import discover_fds_fastfds
from desbordante_spark.discovery.fd_mine import discover_fds_fdmine_minimized
from desbordante_spark.discovery.fdep import discover_fds_fdep
from desbordante_spark.discovery.fun import discover_fds_fun
from desbordante_spark.discovery.hyfd import discover_fds_hybrid
from desbordante_spark.discovery.tane import discover_fds

COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"]


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(*COLS)

    results = {}
    for name, miner in [
        ("tane", lambda df: discover_fds(df, max_lhs=2)),
        ("hyfd", lambda df: discover_fds_hybrid(df, max_lhs=2)),
        ("fdep", lambda df: discover_fds_fdep(df, max_lhs=2)),
        ("dfd", lambda df: discover_fds_dfd(df, max_lhs=2)),
        ("fun", lambda df: discover_fds_fun(df, max_lhs=2)),
        ("fastfds", lambda df: discover_fds_fastfds(df, max_lhs=2)),
        ("depminer", lambda df: discover_fds_depminer(df, max_lhs=2)),
        ("fd_mine",
         lambda df: discover_fds_fdmine_minimized(df, max_lhs=2)),
    ]:
        results[name] = miner(orders)
        print(f"{name:>8}: {len(results[name])} minimal FDs")

    want = results["tane"]
    assert all(r == want for r in results.values()), "strategies disagree"
    for lhs, rhs in want[:8]:
        print(f"  {{{', '.join(lhs) or '∅'}}} -> {rhs}")
    print("all eight strategies agree")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-mine-fd-strategies"))
