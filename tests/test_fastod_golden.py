"""FASTOD canonical-result hash goldens (test_fastod.cpp:50-77).

The reference pins, per dataset, one combined hash over its three sorted
canonical OD vectors (ascending / descending / simple-constancy), built
from fastod::hashing::CombineHashes (hashing.h:8-11), the per-OD std::hash
specializations (canonical_od.h — CombineHashes of the context bitmask
with the attribute pair / right attribute) and the CanonicalOD sort
orders (canonical_od.cpp:51-89 — by attribute pair then context mask;
simple by right then mask). ``discover_ods_fastod`` reproduces those
hashes bit-for-bit on the bundled numeric datasets.

The four larger datasets (horse 10 cols, abalone 8 cols x 4.2k rows,
breast-cancer 11 cols, echocardiogram 13 cols) take minutes of
chunked-batch wall time at local scale and run only with
``SPARK_GRAFT_HEAVY_GOLDEN=1`` (see SURVEY §5.2 for the round-4
verification record). The string-valued goldens (TestFD, WDC_* —
test_fastod.cpp:60-65) run through the typed-comparator rank encoding
(``discovery/fastod_encode.typed_rank_encode`` — deduced column types,
mixed-column ValueToString cross-type comparator, BigInt-as-string
order) and also reproduce the reference hashes bit-for-bit.
"""

from __future__ import annotations

import csv
import os

import pytest

DATA = "/root/reference/test_input_data"
M64 = (1 << 64) - 1


def chash(a: int, b: int) -> int:
    """fastod::hashing::CombineHashes — 64-bit size_t arithmetic."""
    return (a ^ ((b + 2654435769 + ((a << 6) & M64) + (a >> 2)) & M64)) & M64


def vech(hashes) -> int:
    r = 0
    for h in hashes:
        r = chash(r, h)
    return r


def fastod_result_hash(res: dict) -> int:
    def mask(ctx):
        return sum(1 << i for i in ctx)

    asc = sorted(res["asc"], key=lambda t: (t[1], t[2], mask(t[0])))
    desc = sorted(res["desc"], key=lambda t: (t[1], t[2], mask(t[0])))
    simple = sorted(res["simple"], key=lambda t: (t[1], mask(t[0])))
    return vech([
        vech([chash(mask(c), chash(left, r)) for c, left, r in asc]),
        vech([chash(mask(c), chash(left, r)) for c, left, r in desc]),
        vech([chash(mask(c), r) for c, r in simple]),
    ])


def load_numeric(spark, rel_path):
    with open(f"{DATA}/{rel_path}", newline="") as f:
        rows = list(csv.reader(f))
    hdr, data = rows[0], [r for r in rows[1:] if len(r) == len(rows[0])]
    cols = [f"c{i}" for i in range(len(hdr))]
    df = spark.createDataFrame(
        [[float(v) for v in r] for r in data],
        ", ".join(f"{c} double" for c in cols),
    )
    return df, cols


FAST_GOLD = [
    ("od_norm_data/small_2x3.csv", 14827049072319306073),
    ("od_norm_data/small_3x3.csv", 66466490561337),
    ("od_norm_data/OD_norm.csv", 8741296102670149192),
    ("BernoulliRelation.csv", 6518269127574092257),
    ("od_norm_data/metanome/iris_norm.csv", 11093822414574),
    ("od_norm_data/metanome/balance-scale_norm.csv", 11093822414574),
]

HEAVY_GOLD = [
    ("od_norm_data/metanome/horse_10c_norm.csv", 1462534374501425106),
    ("od_norm_data/metanome/abalone_norm.csv", 14398696798633970055),
    ("od_norm_data/metanome/breast-cancer-wisconsin.csv",
     4334402279000540119),
    ("od_norm_data/metanome/echocardiogram_norm.csv", 2243402441338221665),
]


STRING_GOLD = [
    ("TestFD.csv", 15333753345229147120),
    ("WDC_astrology.csv", 723643032648123806),
    ("WDC_game.csv", 3164616462792843131),
    ("WDC_planetz.csv", 11920309231858256338),
    ("WDC_symbols.csv", 2211268401046792),
]


def load_strings(spark, rel_path):
    with open(f"{DATA}/{rel_path}", newline="") as f:
        rows = list(csv.reader(f))
    hdr, data = rows[0], rows[1:]
    cols = [f"c{i}" for i in range(len(hdr))]
    df = spark.createDataFrame(
        [[str(v) for v in r] for r in data],
        ", ".join(f"{c} string" for c in cols),
    )
    return df, cols


def test_fastod_reference_hashes(spark):
    from desbordante_spark.discovery.fastod import discover_ods_fastod

    for rel, want in FAST_GOLD:
        df, cols = load_numeric(spark, rel)
        res = discover_ods_fastod(df, columns=cols)
        assert fastod_result_hash(res) == want, (rel, res)


def test_fastod_reference_hashes_string_typed(spark):
    """String/mixed-typed datasets through the typed-comparator rank
    encoding (fastod_encode) — TestFD has mixed columns (int/double/
    string in one column, ValueToString cross-type order), WDC_symbols
    multi-byte UTF-8 glyphs (byte-wise order), WDC_planetz int+double
    columns deduced Double (numeric-equality ranking)."""
    from desbordante_spark.discovery.fastod import discover_ods_fastod
    from desbordante_spark.discovery.fastod_encode import typed_rank_encode

    for rel, want in STRING_GOLD:
        df, cols = load_strings(spark, rel)
        enc = typed_rank_encode(df, cols)
        res = discover_ods_fastod(enc, columns=cols)
        assert fastod_result_hash(res) == want, (rel, res)


def test_typed_rank_encode_semantics(spark):
    """Unit checks of the encoder itself: numeric columns rank by parsed
    value ('1' == '01' == leading-plus), nulls/empties/NULL-literal share
    the lowest rank, mixed columns follow the ValueToString cross-type
    order (int 8 vs '-': '-' (0x2D) < '8' (0x38))."""
    from desbordante_spark.discovery.fastod_encode import typed_rank_encode

    df = spark.createDataFrame(
        [
            (0, "01", "8", "b"),
            (1, "1", "-", "a"),
            (2, "2.0", "hjkl", None),
            (3, "NULL", "444", ""),
        ],
        "rid int, num string, mix string, s string",
    )
    enc = sorted(
        typed_rank_encode(df, ["num", "mix", "s"]).collect(),
        key=lambda r: r["rid"],
    )
    num = [r["num"] for r in enc]
    # '01' and '1' equal (rank 2 after the null), '2.0' above
    assert num == [2, 2, 3, 1]
    mix = [r["mix"] for r in enc]
    # '-' < 8 < 444? No: cross-type is string order of to_string forms,
    # same-type (8, 444) numeric: '-'(0x2D) < both; 8 < 444 numeric;
    # 'hjkl' > '8' and > '444' as strings
    assert mix[1] < mix[0] < mix[3] < mix[2]
    s = [r["s"] for r in enc]
    assert s == [3, 2, 1, 1]  # None and '' tie lowest


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_HEAVY_GOLDEN"),
    reason="minutes-long lattices; run with SPARK_GRAFT_HEAVY_GOLDEN=1",
)
@pytest.mark.parametrize("rel,want", HEAVY_GOLD)
def test_fastod_reference_hashes_heavy(spark, rel, want):
    from desbordante_spark.discovery.fastod import discover_ods_fastod

    df, cols = load_numeric(spark, rel)
    df = df.cache()
    res = discover_ods_fastod(df, columns=cols)
    assert fastod_result_hash(res) == want, rel


def test_fastod_bernoulli_content(spark):
    """Value-level spot check (not just hashes): every reported simple OD
    really is a constancy dependency — the RHS takes one value per
    context group."""
    from pyspark.sql import functions as F

    from desbordante_spark.discovery.fastod import discover_ods_fastod

    df, cols = load_numeric(spark, "BernoulliRelation.csv")
    res = discover_ods_fastod(df, columns=cols)
    assert len(res["asc"]) == 30 and len(res["desc"]) == 30
    assert len(res["simple"]) == 12
    for ctx, r in res["simple"]:
        grouped = df.groupBy(*[cols[i] for i in ctx]).agg(
            F.count_distinct(cols[r]).alias("nv")
        )
        assert grouped.agg(F.max("nv")).collect()[0][0] == 1, (ctx, r)
