"""Reference Split DD-discovery goldens, replayed through the faithful
search (`discovery/split_search.py`).

Every case transplants a reference fixture verbatim:

* Test0-Test4 — src/tests/test_split.cpp:51-146 over
  test_input_data/TestDD{,1,2,3}.csv and dif_tables/TestDif{,1,2,3}.csv.
  Test3/Test4 each admit TWO minimal covers (the reference's
  RemoveTransitiveDDs removes one DD per pass, order-dependent —
  test_split.cpp comments show the alternative); we accept either.
* flights — examples/mining_dd.py over examples/datasets/flights_dd.csv
  + flights_dd_dif_table.csv (string Levenshtein distances): the three
  DDs the walkthrough explains must be in the mined cover.
"""

from __future__ import annotations

import pytest

from desbordante_spark.discovery.split_search import (
    discover_dds_split,
    parse_difference_rows,
)

# -- fixture data (reference test_input_data/*.csv, verbatim) -------------

TEST_DD = (
    ["Col0", "Col1", "Col2", "Col3", "Col4"],
    [
        (1, 6, 470, 123, 345),
        (2, 10, 520, 456, 234),
        (3, 14, 590, 678, 789),
        (4, 22, 500, 345, 414),
        (5, 20, 600, 234, 347),
    ],
)
TEST_DD1 = (["Col0", "Col1"], [(1, 3), (2, 5), (3, 7)])
TEST_DD2 = (["Col1", "Col2", "Col3"], [(1, 6, 12), (2, 14, 5), (3, 10, 17)])
TEST_DD3 = (["Col1", "Col2", "Col3"], [(1, 6, 5), (2, 14, 19), (3, 10, 12)])

TEST_DIF = (
    ["Col0", "Col1", "Col2", "Col3", "Col4"],
    [
        ("[0;0]", "[0;0]", "[0;0]", "[0;0]", "[0;0]"),
        ("[0;1]", "[0;1]", "[0;1]", "[0;1]", "[0;1]"),
        ("[0;2]", "[0;2]", "[0;2]", "[0;2]", "[0;2]"),
        ("[2;3]", "[0;3]", "[0;3]", "[0;3]", "[0;3]"),
        ("[3;4]", "[0;4]", "[0;4]", "[0;4]", "[0;4]"),
        ("-----", "[0;5]", "-----", "-----", "-----"),
    ],
)
TEST_DIF1 = (
    ["Col1", "Col2", "Col3"],
    [
        ("[0;0]", "[0;4]", "[0;5]"),
        ("[0;1]", "[0;6]", "[0;7]"),
        ("[0;2]", "[0;8]", "[0;12]"),
    ],
)
TEST_DIF2 = (
    ["Col1", "Col2", "Col3"],
    [
        ("[0;0]", "[4;4]", "[5;5]"),
        ("[0;1]", "[4;8]", "[5;7]"),
        ("[0;2]", "[8;8]", "[5;12]"),
        ("[1;1]", "-----", "[7;7]"),
        ("[1;2]", "-----", "[7;12]"),
        ("[2;2]", "-----", "[12;12]"),
    ],
)
TEST_DIF3 = (["Col1", "Col2", "Col3"], [("[2;2]", "[4;4]", "[7;7]")])


def _mine(spark, data, dif, **kw):
    header, rows = data
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        ", ".join(["rid long"] + [f"{c} long" for c in header]),
    )
    constraints = None
    if dif is not None:
        constraints = parse_difference_rows(dif[0], dif[1])
    res = discover_dds_split(
        df, difference_constraints=constraints, row_id="rid", **kw
    )
    return {
        (frozenset(dd.lhs), dd.rhs) for dd in res.dds
    }, res


def _gold(pairs):
    """expected_results literal from test_split.cpp → comparable set."""
    return {
        (
            frozenset((c, float(lo), float(hi)) for c, lo, hi in lhs),
            tuple((c, float(lo), float(hi)) for c, lo, hi in rhs)[0],
        )
        for lhs, rhs in pairs
    }


def test_split_test0(spark):
    got, res = _mine(spark, TEST_DD, TEST_DIF)
    assert got == _gold(
        [
            ([("Col4", 2, 4)], [("Col0", 3, 4)]),
            ([("Col1", 2, 5)], [("Col0", 1, 1)]),
        ]
    )
    # 5 rows -> 10 pairs; the distributed stage compacts to <= 10 vectors
    assert res.num_pairs == 10
    assert res.num_distinct_vectors <= 10


def test_split_test1_default_grid(spark):
    got, _ = _mine(spark, TEST_DD1, None)
    assert got == _gold(
        [
            ([("Col1", 2, 3)], [("Col0", 1, 1)]),
            ([("Col0", 1, 1)], [("Col1", 2, 2)]),
        ]
    )


def test_split_test2(spark):
    got, _ = _mine(spark, TEST_DD2, TEST_DIF1)
    assert got == _gold([([("Col3", 5, 5)], [("Col2", 4, 4)])])


def test_split_test3_either_cover(spark):
    got, _ = _mine(spark, TEST_DD2, TEST_DIF2)
    shared = [
        ([("Col3", 7, 12)], [("Col1", 1, 1)]),
        ([("Col3", 5, 5)], [("Col1", 2, 2)]),
        ([("Col3", 5, 7), ("Col2", 4, 4)], [("Col1", 2, 2)]),
        ([("Col3", 12, 12)], [("Col2", 4, 4)]),
        ([("Col3", 7, 7)], [("Col2", 8, 8)]),
        ([("Col1", 1, 1), ("Col3", 5, 7)], [("Col2", 8, 8)]),
        ([("Col1", 2, 2)], [("Col3", 5, 5)]),
        ([("Col2", 8, 8)], [("Col3", 7, 7)]),
        ([("Col1", 1, 1)], [("Col3", 7, 12)]),
        ([("Col1", 1, 1), ("Col2", 4, 4)], [("Col3", 12, 12)]),
    ]
    cover_a = _gold(shared + [([("Col1", 2, 2)], [("Col2", 4, 4)])])
    cover_b = _gold(shared + [([("Col3", 5, 5)], [("Col2", 4, 4)])])
    assert got in (cover_a, cover_b)


def test_split_test4_either_cover(spark):
    got, _ = _mine(spark, TEST_DD3, TEST_DIF3)
    shared = [
        ([("Col3", 7, 7)], [("Col2", 4, 4)]),
        ([("Col2", 4, 4)], [("Col3", 7, 7)]),
    ]
    cover_a = _gold(shared + [([("Col1", 2, 2)], [("Col3", 7, 7)])])
    cover_b = _gold(shared + [([("Col1", 2, 2)], [("Col2", 4, 4)])])
    assert got in (cover_a, cover_b)


def test_split_flights_walkthrough(spark):
    """examples/mining_dd.py — string Levenshtein distances."""
    rows = [
        ("SU 35", "2024-03-06", "Saint Petersburg (LED)", "Moscow (SVO)", 598, 64),
        ("FV 6015", "2024-03-06", "Saint Petersburg (LED)", "Moscow (VKO)", 624, 63),
        ("FV 6027", "2024-03-06", "Saint Petersburg (LED)", "Moscow (SVO)", 598, 66),
        ("FV 6024", "2024-03-03", "Moscow (VKO)", "Saint Petersburg (LED)", 624, 58),
        ("SU 6", "2024-03-06", "Moscow (SVO)", "Saint Petersburg (LED)", 598, 62),
        ("S7 1009", "2024-03-01", "Moscow (DME)", "Saint Petersburg (LED)", 664, 66),
        ("S7 1010", "2024-03-02", "Saint Petersburg (LED)", "Moscow (DME)", 664, 70),
        ("B2 978", "2024-03-07", "Moscow (SVO)", "Minsk (MSQ)", 641, 58),
        ("DP 967", "2024-03-07", "Moscow (VKO)", "Minsk (MSQ)", 622, 73),
        ("B2 981", "2024-03-08", "Minsk (MSQ)", "Moscow (VKO)", 622, 61),
        ("DP 261", "2024-03-06", "Moscow (VKO)", "Kaliningrad (KGD)", 1059, 144),
        ("DP 536", "2024-03-05", "Kaliningrad (KGD)", "Saint Petersburg (LED)", 798, 92),
    ]
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "rid long, flight string, date string, departure string, "
        "arrival string, distance long, duration long",
    )
    constraints = parse_difference_rows(
        ["flight", "date", "departure", "arrival", "distance", "duration"],
        [
            ("-----", "-----", "[0;0]", "[0;0]", "[0;50]", "[0;15]"),
            ("-----", "-----", "[0;3]", "[0;3]", "------", "------"),
        ],
    )
    res = discover_dds_split(
        df, difference_constraints=constraints, row_id="rid"
    )
    got = {(frozenset(dd.lhs), dd.rhs) for dd in res.dds}
    walkthrough = _gold(
        [
            (
                [("departure", 0, 0), ("arrival", 0, 0)],
                [("distance", 0, 50)],
            ),
            ([("distance", 0, 50)], [("duration", 0, 15)]),
            (
                [("departure", 0, 3), ("arrival", 0, 3)],
                [("duration", 0, 15)],
            ),
        ]
    )
    assert walkthrough <= got


def test_split_null_rejected(spark):
    df = spark.createDataFrame(
        [(0, 1, None), (1, 2, 5)], "rid long, a long, b int"
    )
    with pytest.raises(ValueError, match="null"):
        discover_dds_split(df, row_id="rid")


def test_split_budget_guard(spark):
    df = spark.createDataFrame(
        [(i, i, i * 7 % 13) for i in range(30)], "rid long, a long, b long"
    )
    with pytest.raises(ValueError, match="budget"):
        discover_dds_split(df, row_id="rid", distinct_budget=3)
