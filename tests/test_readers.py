"""CSV / pandas source semantics (reference parser parity)."""

from __future__ import annotations

import pandas as pd

from desbordante_spark.sources.readers import from_pandas, read_csv


def test_read_csv_semantics(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text('a,b\n1,"x,y"\n2,z\n')
    df = read_csv(spark, str(p), has_header=True)
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [("1", "x,y"), ("2", "z")]  # quoted separator preserved


def test_read_csv_headerless_names(spark, tmp_path):
    p = tmp_path / "t2.csv"
    p.write_text("1;x\n2;y\n")
    df = read_csv(spark, str(p), separator=";", has_header=False)
    # synthesized ordinal names (csv_parser.cpp:43-51)
    assert df.columns == ["col0", "col1"]
    assert df.count() == 2


def test_from_pandas(spark):
    pdf = pd.DataFrame({"x": [1, 2, None], "s": ["a", None, "c"]})
    df = from_pandas(spark, pdf)
    assert df.count() == 3
    assert df.filter("x IS NULL").count() == 1  # pandas.isna -> SQL NULL
