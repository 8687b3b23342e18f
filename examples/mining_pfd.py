"""PFD mining — mirrors /root/reference/examples/mining_pfd.py: discover
probabilistic FDs under the per_value error measure (every LHS value
weighs equally, so a few huge dirty clusters don't drown out systematic
per-value violations) and contrast with per_tuple."""

from __future__ import annotations

from desbordante_spark.discovery.pfdtane import discover_afds

COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(*COLS)
    orders = orders.cache()
    orders.count()

    for measure in ("per_value", "per_tuple"):
        pfds = discover_afds(
            orders, max_lhs=2, max_error=0.35, error_measure=measure
        )
        shown = ", ".join(
            f"{{{','.join(l) or '∅'}}}->{r}@{e:.3f}"
            for l, r, e in pfds[:5]
        )
        print(f"{measure}: {len(pfds)} PFDs  [{shown}]")
    orders.unpersist()


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-mine-pfd"))
