"""Typo mining — mirrors /root/reference/examples/mine_typos.py: clusters
where an almost-FD is broken by a minority value within a small edit
distance of the cluster majority (AFD∖FD + levenshtein)."""

from __future__ import annotations

from desbordante_spark.pipelines.typo_miner import find_typo_candidates


def main(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    rows = [
        ("acme", "Anvils Inc."), ("acme", "Anvils Inc."),
        ("acme", "Anvils Inc."), ("acme", "Anvils Imc."),   # typo
        ("zenith", "Widgets Ltd"), ("zenith", "Widgets Ltd"),
        ("orbit", "Gears LLC"), ("orbit", "Cogs LLC"),       # not a typo (far)
    ]
    df = spark.createDataFrame(rows, "account string, vendor string")
    cands = find_typo_candidates(df, ["account"], "vendor",
                                 radius=2, ratio=0.5).collect()
    print(f"{len(cands)} typo candidate(s):")
    for c in cands:
        print(f"  account={c['account']}: '{c['candidate_value']}' "
              f"(x{c['candidate_count']}) vs majority "
              f"'{c['majority_value']}' at distance {c['distance']}")


if __name__ == "__main__":
    from desbordante_spark.session import get_spark

    main(get_spark(app_name="example-typos"))
