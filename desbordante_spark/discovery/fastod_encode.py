"""Typed-comparator rank encoding for FASTOD — the reference's
``ConvertColumnDataToIntegers`` as a Spark pre-pass.

Reference: FASTOD consumes an integer frame produced by sorting each
column under the typed comparator and dense-ranking consecutive equal
values (/root/reference/src/core/algorithms/od/fastod/storage/
data_frame.cpp:125-171). The comparator (util/type_util.h:13-45):

- null/empty/undefined values are UNORDERED — all mutually equal and
  LESS than every ordered value;
- a NON-mixed column compares by its deduced type: Int/Double numeric,
  String byte-wise, Date chronological, BigInt **lexicographic on the
  raw text** (BigIntType : public StringType, big_int_type.h:7);
- a MIXED column compares same-type values with that type's comparator
  and different-type values as STRINGS of their canonical forms
  (``ValueToString`` — std::to_string: int → decimal text, double →
  fixed 6-decimal ``%f``, date → ISO extended, string/bigint → raw
  text; type_util.cpp:12-26, numeric_type.h:111, date_type.h:25).
  ``CreateTypeMap`` additionally re-files Int values under BigInt when
  both occur in one column (typed_column_data.cpp:108-112).

Column/value types come from ``operators/schema_infer.type_profile`` —
the same deduction the reference runs (typed_column_data.cpp:24-81),
already golden-matched against its test corpus.

Spark-first: every non-mixed column is ranked with ONE ``dense_rank``
window over an order-preserving key expression (numeric cast / raw
string / normalized date) — nulls first, ties share a rank — so the
whole frame encodes in a single select. Mixed columns (a data-quality
anomaly: e.g. ``{"8", "-", "hjkl"}``) cannot be keyed by any single
expression because cross-type pairs compare through ``ValueToString``
while same-type pairs compare natively; their (bounded, capped)
DISTINCT value set is collected and ranked on the driver with the
replicated comparator, then applied as a literal-map lookup — the
reference holds the entire column in memory for the same step, so the
driver-side distinct set is strictly cheaper. Above ``small_table_rows``
the global window (one reducer) is swapped per column for
``_distinct_dense_rank`` — rank the distinct key set under a
range-partitioned plan, null-safe join the ranks back — producing
IDENTICAL ranks with no full-table single-partition sort.

Caveat: ``std::sort`` demands a strict weak order; the mixed comparator
can in principle be intransitive (int 2 < int 10 numerically while
``"10" < "1a" < "2"`` as strings). ``sorted(..., key=cmp_to_key)`` is
deterministic here; inputs that actually trigger intransitivity have
unspecified order in the reference too.
"""

from __future__ import annotations

import re
from datetime import date as _date
from functools import cmp_to_key

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from desbordante_spark.operators.schema_infer import type_profile

__all__ = ["typed_rank_encode"]

# the SAME class boundaries type_profile uses (operators/schema_infer.py)
# — the mixed-column driver ranking must agree exactly with the deduced
# column type that routed it, so the patterns are IMPORTED, not copied
from desbordante_spark.operators.schema_infer import (  # noqa: E402
    _RE_BIGINT as _BIGINT_SQL,
    _RE_DATE_DELIM as _DATE_DELIM_SQL,
    _RE_DATE_UNDELIM as _DATE_UNDELIM_SQL,
    _RE_DOUBLE as _DOUBLE_SQL,
    _RE_INT as _INT_SQL,
)

_RE_INT = re.compile(_INT_SQL)
_RE_BIGINT = re.compile(_BIGINT_SQL)
_RE_DOUBLE = re.compile(_DOUBLE_SQL)


def _with_year_group(pattern: str) -> re.Pattern:
    """Compile a schema_infer date shape with the year captured (the
    Python parser reads groups year/month/day; the SQL side needs none)."""
    assert pattern.startswith("^[0-9]{4}"), pattern
    return re.compile(pattern.replace("^[0-9]{4}", "^([0-9]{4})", 1))


_RE_DATE_DELIM = _with_year_group(_DATE_DELIM_SQL)
_RE_DATE_UNDELIM = _with_year_group(_DATE_UNDELIM_SQL)


def _parse_date(v: str) -> _date | None:
    """Calendar-checked date under either reference shape (schema_infer's
    rules: boost rejects non-leap Feb 29; years below 1400 out of range)."""
    m = _RE_DATE_DELIM.match(v)
    if m is None:
        m = _RE_DATE_UNDELIM.match(v)
    if m is None:
        return None
    try:
        d = _date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    except ValueError:
        return None
    return d if d.year >= 1400 else None


def _value_class_py(v: str) -> tuple[str, object]:
    """(class, parsed value) — deterministic checker precedence
    date → int → bigint → double → string (schema_infer._value_class)."""
    d = _parse_date(v)
    if d is not None:
        return "date", d
    if _RE_INT.match(v):
        return "int", int(v)
    if _RE_BIGINT.match(v):
        return "bigint", v
    if _RE_DOUBLE.match(v):
        return "double", float(v)
    return "string", v


def _canon_str(cls: str, parsed: object, raw: str) -> bytes:
    """``ValueToString`` for cross-type comparisons, as UTF-8 bytes
    (C++ std::string compares byte-wise)."""
    if cls == "int":
        return str(parsed).encode("utf-8")
    if cls == "double":
        return f"{parsed:.6f}".encode("utf-8")  # std::to_string's %f
    if cls == "date":
        return parsed.isoformat().encode("utf-8")  # to_iso_extended_string
    return raw.encode("utf-8")  # string / bigint: the raw text


def _mixed_rank_map(values: list[str]) -> dict[str, int]:
    """Driver-side replica of ``ConvertColumnDataToIntegers`` for one
    mixed column's distinct ordered values → rank (1-based)."""
    classed = []
    for raw in values:
        cls, parsed = _value_class_py(raw)
        classed.append([cls, parsed, raw])
    # Int + BigInt in one column → ints re-filed as BigInt (= StringType:
    # raw-text storage and comparison), typed_column_data.cpp:108-112
    if any(c[0] == "bigint" for c in classed):
        for c in classed:
            if c[0] == "int":
                c[0] = "bigint"
                c[1] = c[2]

    def cmp(a, b) -> int:
        ca, pa, ra = a
        cb, pb, rb = b
        if ca == cb:
            if ca in ("string", "bigint"):
                ka, kb = ra.encode("utf-8"), rb.encode("utf-8")
            else:
                ka, kb = pa, pb
        else:
            ka = _canon_str(ca, pa, ra)
            kb = _canon_str(cb, pb, rb)
        return -1 if ka < kb else (1 if ka > kb else 0)

    ordered = sorted(classed, key=cmp_to_key(cmp))
    ranks: dict[str, int] = {}
    rank = 0
    prev = None
    for item in ordered:
        if prev is None or cmp(prev, item) != 0:
            rank += 1
        ranks[item[2]] = rank
        prev = item
    return ranks


def _distinct_dense_rank(df: DataFrame, key) -> DataFrame:
    """Global dense rank of ``key``'s distinct values — nulls first at
    rank 1 — WITHOUT a single-reducer sort: range-partition the distinct
    set (disjoint ordered key ranges), rank within each partition under a
    PARTITIONED window (no global funnel), then add per-partition offsets
    computed from one tiny collect (≤ shuffle-partitions rows). Returns a
    ``(_k, _r)`` frame with one row per distinct key (incl. the null
    group). ``localCheckpoint`` pins the frame before the two reads
    (offsets + join-back) because ``spark_partition_id`` must not be
    recomputed across jobs."""
    local = (
        df.select(key.alias("_k"))
        .distinct()
        .repartitionByRange(F.col("_k").asc_nulls_first())
        .withColumn("_p", F.spark_partition_id())
        .withColumn(
            "_lr",
            F.row_number().over(
                Window.partitionBy("_p").orderBy(
                    F.col("_k").asc_nulls_first()
                )
            ),
        )
        .localCheckpoint()
    )
    cnts = {
        r["_p"]: r["m"]
        for r in local.groupBy("_p").agg(F.max("_lr").alias("m")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for p in sorted(cnts):
        offsets[p] = running
        running += cnts[p]
    if not offsets:  # empty input
        return local.select("_k", F.lit(1).alias("_r"))
    off_map = F.create_map(
        *[F.lit(x) for p in sorted(offsets) for x in (p, offsets[p])]
    )
    return local.select(
        "_k", (F.col("_lr") + off_map[F.col("_p")]).cast("int").alias("_r")
    )


def typed_rank_encode(
    df: DataFrame,
    columns: list[str] | None = None,
    null_literal: str = "NULL",
    max_mixed_distinct: int = 100_000,
    small_table_rows: int = 1_000_000,
) -> DataFrame:
    """Encode every column to its typed-comparator dense rank (int).

    Nulls/empties (SQL NULL, the ``null_literal`` token, the empty
    string) share the LOWEST rank per column, matching the reference's
    unordered-values-first comparator. Output columns keep their names;
    columns of ``df`` not in ``columns`` pass through unchanged; row
    multiplicity is preserved (row ORDER is not — Spark). Feed the
    result to ``discover_ods_fastod`` for string-typed datasets.

    Scale routing: tables up to ``small_table_rows`` encode with one
    ``dense_rank`` window per column in a single select (a global window
    — one reducer — which at that size is cheaper than extra shuffles);
    larger tables switch per column to ``_distinct_dense_rank`` (rank
    the DISTINCT key set under a range-partitioned, windowed-per-
    partition plan, then null-safe hash-join the ranks back), so no
    reducer ever sorts the full table. Both paths produce identical
    ranks."""
    cols = list(columns or df.columns)
    prof = {
        r["column"]: r["inferred_type"]
        for r in type_profile(df, cols, null_literal=null_literal).collect()
    }
    big = df.count() > small_table_rows
    out_exprs = []
    deferred: list[tuple[str, object]] = []  # big-path (column, key expr)
    for c in cols:
        v = F.col(c).cast("string")
        nullish = v.isNull() | (v == null_literal) | (v == "")
        t = prof[c]
        if t == "undefined":
            out_exprs.append(F.lit(1).alias(c))
            continue
        if t == "mixed":
            vals = [
                r[0]
                for r in df.select(v.alias("v"))
                .where(~nullish)
                .distinct()
                .collect()
            ]
            if len(vals) > max_mixed_distinct:
                raise ValueError(
                    f"mixed column {c!r} has {len(vals)} distinct values "
                    f"(> max_mixed_distinct={max_mixed_distinct})"
                )
            ranks = _mixed_rank_map(vals)
            lookup = F.create_map(
                *[
                    F.lit(x)
                    for raw in sorted(ranks)
                    for x in (raw, ranks[raw])
                ]
            )
            out_exprs.append(
                F.when(nullish, F.lit(1))
                .otherwise(F.element_at(lookup, v) + 1)
                .alias(c)
            )
            continue
        if t in ("int",):
            # ANSI cast on purpose: a value that fails the cast would
            # silently misrank under try_cast — fail loudly instead
            key = F.when(nullish, F.lit(None)).otherwise(
                v.cast("decimal(38,0)")
            )
        elif t == "double":
            key = F.when(nullish, F.lit(None)).otherwise(v.cast("double"))
        elif t == "date":
            delim = F.translate(v, "/.", "--").cast("date")
            undelim = F.concat_ws(
                "-",
                F.substring(v, 1, 4),
                F.substring(v, 5, 2),
                F.substring(v, 7, 2),
            ).cast("date")
            key = (
                F.when(nullish, F.lit(None))
                .when(v.rlike(_DATE_DELIM_SQL), delim)
                .otherwise(undelim)
            )
        else:
            # string AND bigint columns: byte-wise raw-text order
            # (BigIntType : public StringType)
            key = F.when(nullish, F.lit(None)).otherwise(v)
        if big:
            deferred.append((c, key))
            out_exprs.append(F.col(f"__rank_{c}").alias(c))
        else:
            out_exprs.append(
                F.dense_rank()
                .over(Window.orderBy(key.asc_nulls_first()))
                .alias(c)
            )
    passthrough = [F.col(c) for c in df.columns if c not in cols]
    base = df
    for c, key in deferred:
        # rank the column's distinct keys (distributed — see
        # _distinct_dense_rank), then null-safe hash-join them back; the
        # rank side holds one row per distinct value, so the join never
        # changes row multiplicity
        ranked = _distinct_dense_rank(df, key).select(
            F.col("_k").alias(f"__k_{c}"), F.col("_r").alias(f"__rank_{c}")
        )
        base = base.withColumn(f"__key_{c}", key).join(
            ranked,
            on=F.col(f"__key_{c}").eqNullSafe(F.col(f"__k_{c}")),
            how="left",
        )
    return base.select(*out_exprs, *passthrough)
