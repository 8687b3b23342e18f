"""AFD discovery at several error thresholds — mirrors /root/reference/
examples/afd_multiple_error_thresholds.py: load the relation once, then
re-execute the miner with different ``error`` options (the reference's
configure/execute lifecycle). A larger threshold can only ADD dependencies
whose LHS is the same or smaller — the result sets grow monotonically in
coverage."""

from __future__ import annotations

from desbordante_spark.discovery.pfdtane import discover_afds

COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(*COLS)
    orders = orders.cache()  # load once, mine many times
    orders.count()

    def covers(afds, lhs, rhs):
        return any(r == rhs and set(l) <= set(lhs) for l, r, _e in afds)

    prev = None
    for err in (0.0, 0.1, 0.3, 0.5):
        afds = discover_afds(orders, max_lhs=2, max_error=err)
        shown = ", ".join(
            f"{{{','.join(l) or '∅'}}}->{r}" for l, r, _ in afds[:6]
        )
        print(f"error <= {err}: {len(afds)} minimal AFDs  [{shown}]")
        if prev is not None:
            # every dependency found at the tighter threshold stays covered
            assert all(covers(afds, l, r) for l, r, _ in prev)
        prev = afds
    orders.unpersist()


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-afd-thresholds"))
