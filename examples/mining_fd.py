"""FD / UCC discovery — mirrors /root/reference/examples/mining_fd.py: all
minimal FDs (levelwise TANE-style, one batched distinct-count job per level)
plus the minimal keys."""

from __future__ import annotations

from desbordante_spark.discovery.tane import discover_fds, discover_uccs

COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"]


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(*COLS)

    fds = discover_fds(orders, max_lhs=2)
    print(f"{len(fds)} minimal FDs (|lhs| <= 2):")
    for lhs, rhs in fds[:10]:
        print(f"  {{{', '.join(lhs) or '∅'}}} -> {rhs}")

    uccs = discover_uccs(orders, max_size=2)
    print(f"{len(uccs)} minimal keys: {[','.join(u) for u in uccs]}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-mine-fd"))
