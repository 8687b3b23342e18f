"""Search-strategy parity for the sampled/traversal miners — mirrors the
reference's Pyro and HyUCC algorithm surfaces (`algorithm_types.h`; Pyro:
`fd/pyro/pyro.h:13-31`, HyUCC: `ucc/hyucc/`):

- Pyro traversal  estimate-steered ascend / exact classify / trickle-down;
                  identical AFD output to the levelwise PFDTane miner
- HyUCC hybrid    sampled negative cover + batched validation; identical
                  UCC output to the levelwise TANE miner
- PyroUCC         the same Pyro traversal with ONE search space over the
                  schema and the key-g1 target (`ucc/pyroucc/pyroucc.cpp`);
                  identical AUCC output to the levelwise enumeration

Estimates only steer the walks — every reported dependency passed an
exact check, so all pairs must agree bit-for-bit."""

from __future__ import annotations

from desbordante_spark.discovery.aucc import (
    discover_auccs,
    discover_auccs_pyro,
)
from desbordante_spark.discovery.hyucc import discover_uccs_hybrid
from desbordante_spark.discovery.pfdtane import discover_afds
from desbordante_spark.discovery.pyro import discover_afds_pyro
from desbordante_spark.discovery.tane import discover_uccs

COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"]


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(*COLS)

    stats: dict = {}
    level = discover_afds(orders, max_lhs=2, max_error=0.3)
    pyro = discover_afds_pyro(orders, max_lhs=2, max_error=0.3, stats=stats)
    assert level == pyro, "Pyro traversal disagrees with levelwise"
    print(f"pyro: {len(pyro)} minimal AFDs in {stats['rounds']} rounds "
          f"({stats['exact_scored']} exact / {stats['estimate_scored']} "
          f"estimated node visits)")
    for lhs, rhs, err in pyro[:6]:
        print(f"  {{{', '.join(lhs) or '∅'}}} -> {rhs} (err={err:.4f})")

    tane = sorted(discover_uccs(orders, max_size=2))
    hyucc = sorted(discover_uccs_hybrid(orders, max_size=2))
    assert tane == hyucc, "HyUCC disagrees with levelwise"
    print(f"hyucc: {len(hyucc)} minimal UCCs "
          f"({', '.join('{' + ','.join(u) + '}' for u in hyucc)})")

    ustats: dict = {}
    aucc_level = discover_auccs(orders, max_size=2, max_error=0.05)
    aucc_pyro = discover_auccs_pyro(
        orders, max_size=2, max_error=0.05, stats=ustats
    )
    assert aucc_level == aucc_pyro, "PyroUCC disagrees with levelwise"
    print(f"pyroucc: {len(aucc_pyro)} minimal AUCCs in {ustats['rounds']} "
          f"rounds ({ustats['exact_scored']} exact / "
          f"{ustats['estimate_scored']} estimated node visits)")
    for s, err in aucc_pyro[:4]:
        print(f"  {{{', '.join(s)}}} (err={err:.4f})")
    print("traversal strategies agree")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="mining-traversal-strategies"))
