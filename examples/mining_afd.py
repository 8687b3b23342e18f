"""AFD discovery — mirrors /root/reference/examples/mining_afd.py and
afd_multiple_error_thresholds.py: minimal approximate FDs at several error
thresholds (PFDTane per_tuple measure, one batched job per lattice level)."""

from __future__ import annotations

from desbordante_spark.discovery.pfdtane import discover_afds

COLS = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(*COLS)
    for threshold in (0.05, 0.3, 0.6):
        afds = discover_afds(orders, COLS, max_lhs=2, max_error=threshold)
        print(f"max_error={threshold}: {len(afds)} minimal AFDs")
        for lhs, rhs, err in afds[:5]:
            print(f"  {{{', '.join(lhs) or '∅'}}} -> {rhs}  (error {err:.4f})")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-mine-afd"))
