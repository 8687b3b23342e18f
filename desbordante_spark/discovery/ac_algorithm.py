"""Faithful BHUNT-style algebraic-constraint (AC) discovery.

Reference: /root/reference/src/core/algorithms/algebraic_constraints/
ac_algorithm.cpp (BHUNT sample-size formula lines 97-125, seeded
bernoulli sampling iteration 155-192, disjunctive range construction
263-299, bumps restriction 194-219, column-pair driver 312-346) and
ac_exception_finder.cpp (closed-interval membership + per-row exception
grouping). Golden replay: src/tests/test_ac_algorithm.cpp.

Split of labor with the Spark path (operators/ac.py):

- ``operators/ac.py`` is the SCALE engine — distributed sampling, range
  literals pushed into the scan, exception filter as one Catalyst job.
  That's what the registry gate (``ac_exceptions_lineitem``) runs.
- THIS module is the conformance replica: it reproduces the reference's
  results value-for-value, including its ``std::mt19937`` +
  ``std::bernoulli_distribution`` sampling stream (emulated below from
  the published algorithms — MT19937 is Matsumoto & Nishimura's public
  generator; ``generate_canonical`` follows the libstdc++ definition of
  the C++ standard's [rand.util.canonical]), the Abramowitz & Stegun
  normal-quantile approximation behind the BHUNT sample-size bound, and
  the reference's typed arithmetic (C++ ``int64`` truncating division).
  It is driver-side BY CONSTRUCTION — the reference's sampler is a
  sequential RNG scan, so parity requires replaying that scan; use it on
  bounded fixtures/samples, and hand its ranges to
  ``operators/ac.ac_exceptions`` for a distributed exception scan.

No reference code is copied: every routine is re-derived from the cited
semantics against the published test expectations.
"""

from __future__ import annotations

import csv
import math
import re
from dataclasses import dataclass, field

__all__ = [
    "calculate_sample_size",
    "construct_disjunctive_ranges",
    "restrict_ranges_amount",
    "deduce_column_types",
    "ACCollection",
    "ACFaithful",
    "load_reference_csv",
]

NULL = "NULL"  # model/table/relation_data.h:23 kNullValue


# ------------------------------------------------------------------ RNG


class _MT19937:
    """Standard MT19937 (public Matsumoto/Nishimura init_genrand +
    generation), bit-identical to ``std::mt19937(seed)``."""

    def __init__(self, seed: int):
        mt = [0] * 624
        mt[0] = seed & 0xFFFFFFFF
        for i in range(1, 624):
            mt[i] = (
                1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i
            ) & 0xFFFFFFFF
        self._mt = mt
        self._i = 624

    def _twist(self) -> None:
        mt = self._mt
        for i in range(624):
            y = (mt[i] & 0x80000000) | (mt[(i + 1) % 624] & 0x7FFFFFFF)
            v = mt[(i + 397) % 624] ^ (y >> 1)
            if y & 1:
                v ^= 0x9908B0DF
            mt[i] = v
        self._i = 0

    def next_u32(self) -> int:
        if self._i >= 624:
            self._twist()
        y = self._mt[self._i]
        self._i += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF


def _bernoulli(gen: _MT19937, p: float) -> bool:
    """``std::bernoulli_distribution(p)(gen)``: one canonical double in
    [0, 1) from two 32-bit draws ([rand.util.canonical] with b=53,
    log2r=32 → k=2, exactly libstdc++'s evaluation order), compared < p."""
    x1 = gen.next_u32()
    x2 = gen.next_u32()
    r = (float(x1) + float(x2) * 4294967296.0) / 18446744073709551616.0
    if r >= 1.0:
        r = math.nextafter(1.0, 0.0)
    return r < p


# ------------------------------------------------- BHUNT sample size


def calculate_sample_size(
    n_rows: int, k_bumps: int, fuzziness: float, p_fuzz: float
) -> int:
    """ac_algorithm.cpp:97-125 — Abramowitz & Stegun 26.2.23 normal
    quantile + 26.4.17 chi-square quantile into BHUNT formula (7).
    ``fuzziness == 0`` means exact: sample everything."""
    if fuzziness == 0:
        return n_rows
    c0, c1, c2 = 2.515517, 0.802853, 0.010328
    d1, d2, d3 = 1.432788, 0.189269, 0.001308
    t = math.sqrt(math.log(1.0 / (1.0 - p_fuzz) ** 2.0))
    t2, t3 = t**2.0, t**3.0
    xp = t - ((c0 + c1 * t + c2 * t2) / (1 + d1 * t + d2 * t2 + d3 * t3))
    freedom = 2.0 * (k_bumps + 1)
    tmp1 = 2.0 / (9.0 * freedom)
    tmp2 = 1.0 - tmp1 + xp * math.sqrt(tmp1)
    xp2 = freedom * tmp2**3.0
    return int((xp2 * (2.0 - fuzziness)) / (4.0 * fuzziness) + k_bumps / 2.0)


# ------------------------------------------------- typed value layer


def _trunc_div(a: int, b: int) -> int:
    """C++ int64 division truncates toward zero (Python // floors)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


class _Num:
    """The reference's INumericType surface for the two numeric TypeIds
    (type.h:33-36: ONLY Int and Double are numeric — BigInt is excluded
    there, which is why e.g. SimpleTypes pairs only (Int,Int1) and
    (Double,IntAndDouble))."""

    def __init__(self, type_id: str):
        assert type_id in ("int", "double")
        self.type_id = type_id

    def parse(self, raw: str):
        return int(raw) if self.type_id == "int" else float(raw)

    def binop(self, a, b, op: str):
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return _trunc_div(a, b) if self.type_id == "int" else a / b
        raise ValueError(f"unknown bin_operation {op!r}")

    @staticmethod
    def dist(a, b) -> float:
        return abs(float(a) - float(b))


# ------------------------------------------------- type deduction

_INT_RE = re.compile(r"^[+-]?[0-9]{1,19}$")
_BIGINT_RE = re.compile(r"^[+-]?[0-9]{20,}$")
_DOUBLE_RE = re.compile(
    r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$"
)

#: candidate bitsets, low bit = highest priority
#: (typed_column_data.h:235-240 via operators/schema_infer.py TYPE_BITS)
_BITS = {"date": 1, "int": 2, "bigint": 4, "double": 8, "string": 16}
_MASK = {
    "int": _BITS["int"] | _BITS["bigint"] | _BITS["double"],
    "bigint": _BITS["bigint"] | _BITS["double"],
    "double": _BITS["double"],
    "string": _BITS["string"],
}


def _value_mask(v: str) -> int:
    if _INT_RE.match(v):
        return _MASK["int"]
    if _BIGINT_RE.match(v):
        return _MASK["bigint"]
    if _DOUBLE_RE.match(v):
        return _MASK["double"]
    return _MASK["string"]


def deduce_column_types(rows: list[list[str]]) -> list[str]:
    """Per-column reference type deduction (typed_column_data.cpp AND of
    candidate bitsets, lowest set bit wins; all null/empty → undefined;
    empty intersection → mixed). Date shapes are not needed by the AC
    fixtures and deliberately not classified here — the full deduction
    incl. calendar-checked dates lives in operators/schema_infer.py."""
    if not rows:
        return []
    n_cols = len(rows[0])
    masks = [None] * n_cols
    for row in rows:
        for i in range(n_cols):
            v = row[i]
            if v is None or v == "" or v == NULL:
                continue
            m = _value_mask(v)
            masks[i] = m if masks[i] is None else masks[i] & m
    out = []
    for m in masks:
        if m is None:
            out.append("undefined")
        elif m == 0:
            out.append("mixed")
        else:
            # lowest set bit = highest deduction priority
            out.append(next(t for t, b in _BITS.items() if m & b))
    return out


# ------------------------------------------------- range construction


def construct_disjunctive_ranges(sorted_vals: list, weight: float,
                                 num: _Num) -> list[tuple]:
    """ac_algorithm.cpp:263-299 — fewer than two sampled pairs yield no
    ranges; ``weight == 1`` collapses to one [min, max] range; otherwise
    a new range starts where the gap between consecutive sorted sample
    values exceeds ``Dist(first,last) * weight / (1 - weight)``."""
    if len(sorted_vals) < 2:
        return []
    if weight >= 1:
        return [(sorted_vals[0], sorted_vals[-1])]
    delta = num.dist(sorted_vals[0], sorted_vals[-1]) * (
        weight / (1.0 - weight)
    )
    ranges: list[tuple] = []
    lo = sorted_vals[0]
    for i in range(len(sorted_vals) - 1):
        if num.dist(sorted_vals[i], sorted_vals[i + 1]) > delta:
            ranges.append((lo, sorted_vals[i]))
            lo = sorted_vals[i + 1]
    ranges.append((lo, sorted_vals[-1]))
    return ranges


def restrict_ranges_amount(ranges: list[tuple], bumps_limit: int,
                           num: _Num) -> list[tuple]:
    """ac_algorithm.cpp:194-219 — while over the limit, merge the two
    ranges separated by the smallest gap (a single range is never
    restricted; limit 0 = unlimited)."""
    if bumps_limit == 0 or len(ranges) <= 1:
        return ranges
    ranges = list(ranges)
    while len(ranges) > bumps_limit:
        gaps = [
            num.dist(ranges[i][1], ranges[i + 1][0])
            for i in range(len(ranges) - 1)
        ]
        j = min(range(len(gaps)), key=lambda i: gaps[i])
        ranges[j: j + 2] = [(ranges[j][0], ranges[j + 1][1])]
    return ranges


# ------------------------------------------------- the algorithm


@dataclass
class ACCollection:
    """One column pair's result (reference ``RangesCollection`` +
    ``ACPairsCollection``): allowed [lo, hi] ranges plus the sorted
    sample they were built from (for ``reconstruct_ranges``)."""

    lhs: int
    rhs: int
    ranges: list[tuple]
    sample: list = field(repr=False, default_factory=list)


@dataclass
class ACException:
    row: int
    column_pairs: list[tuple[int, int]]


class ACFaithful:
    """Reference ``ACAlgorithm`` parity: same knobs, same sampling
    stream, same results (test_ac_algorithm.cpp golden suite)."""

    def __init__(
        self,
        rows: list[list[str]],
        bin_operation: str = "+",
        fuzziness: float = 0.1,
        p_fuzz: float = 0.9,
        weight: float = 0.1,
        bumps_limit: int = 0,
        iterations_limit: int = 10,
        seed: int = 0,
    ):
        if not (0 <= fuzziness <= 1):
            raise ValueError("fuzziness out of range")
        if not (0 < p_fuzz < 1):
            raise ValueError("p_fuzz out of range")
        if not (0 < weight <= 1):
            raise ValueError("weight out of range")
        self.rows = rows
        self.op = bin_operation
        self.fuzziness = fuzziness
        self.p_fuzz = p_fuzz
        self.weight = weight
        self.bumps_limit = bumps_limit
        self.iterations_limit = iterations_limit
        self.seed = seed
        self.types = deduce_column_types(rows)
        self.collections: list[ACCollection] = []

    # -- column access ------------------------------------------------

    def _cell(self, row_i: int, col_i: int):
        """(is_null_or_empty, typed value or None)."""
        v = self.rows[row_i][col_i]
        if v is None or v == "" or v == NULL:
            return True, None
        return False, v

    # -- sampling -----------------------------------------------------

    def _sampling_iteration(self, lhs_i: int, rhs_i: int,
                            probability: float, num: _Num) -> list:
        """ac_algorithm.cpp:155-192 — one seeded bernoulli pass over the
        rows IN ORDER (the RNG advances on every row, before the
        null/zero checks), then sort the binop results."""
        gen = _MT19937(self.seed)
        vals = []
        for i in range(len(self.rows)):
            if not _bernoulli(gen, probability):
                continue
            l_null, l_raw = self._cell(i, lhs_i)
            r_null, r_raw = self._cell(i, rhs_i)
            if l_null or r_null:
                continue
            l, r = num.parse(l_raw), num.parse(r_raw)
            if self.op == "/" and r == num.parse("0"):
                continue
            vals.append(num.binop(l, r, self.op))
        vals.sort()
        return vals

    def _sampling(self, lhs_i: int, rhs_i: int, num: _Num) -> ACCollection:
        """ac_algorithm.cpp:127-153 — grow the sample until the BHUNT
        bound for the observed bump count is met (or iterations run out),
        then restrict the bump count."""
        n_rows = len(self.rows)
        k_bumps = 1
        i = 0
        sample_size = calculate_sample_size(
            n_rows, k_bumps, self.fuzziness, self.p_fuzz
        )
        new_k = 1
        ranges: list[tuple] = []
        sample: list = []
        while i < self.iterations_limit and (
            not ranges
            or sample_size
            < calculate_sample_size(n_rows, new_k, self.fuzziness,
                                    self.p_fuzz)
        ):
            k_bumps = new_k
            sample_size = calculate_sample_size(
                n_rows, k_bumps, self.fuzziness, self.p_fuzz
            )
            probability = sample_size / float(n_rows)
            sample = self._sampling_iteration(lhs_i, rhs_i, probability, num)
            ranges = construct_disjunctive_ranges(sample, self.weight, num)
            new_k = len(ranges)
            if new_k == 0:
                new_k = k_bumps + 1
            i += 1
        ranges = restrict_ranges_amount(ranges, self.bumps_limit, num)
        return ACCollection(lhs_i, rhs_i, ranges, sample)

    # -- public surface -------------------------------------------------

    def execute(self) -> "ACFaithful":
        """ac_algorithm.cpp:312-346 — every ordered pair of same-TypeId
        numeric columns (division additionally mines the swapped pair —
        it is asymmetric and zero-guarded)."""
        self.collections = []
        for i in range(len(self.types) - 1):
            if self.types[i] not in ("int", "double"):
                continue
            num = _Num(self.types[i])
            for k in range(i + 1, len(self.types)):
                if self.types[k] != self.types[i]:
                    continue
                self.collections.append(self._sampling(i, k, num))
                if self.op == "/":
                    self.collections.append(self._sampling(k, i, num))
        return self

    def ranges_by_columns(self, lhs: int, rhs: int) -> list[tuple]:
        for c in self.collections:
            if (c.lhs, c.rhs) == (lhs, rhs):
                return c.ranges
        raise KeyError(f"no ranges for column pair ({lhs}, {rhs})")

    def reconstruct_ranges(self, lhs: int, rhs: int,
                           weight: float) -> list[tuple]:
        """ac_algorithm.cpp:301-310 — rebuild ranges from the SAVED
        sample under a different weight, no resampling."""
        for c in self.collections:
            if (c.lhs, c.rhs) == (lhs, rhs):
                return construct_disjunctive_ranges(
                    c.sample, weight, _Num(self.types[lhs])
                )
        raise KeyError(f"no sample for column pair ({lhs}, {rhs})")

    def binop_value(self, row: int, lhs: int, rhs: int):
        """Typed binop result for one row/pair, None when skipped
        (null/empty side, or a division by zero)."""
        num = _Num(self.types[lhs])
        l_null, l_raw = self._cell(row, lhs)
        r_null, r_raw = self._cell(row, rhs)
        if l_null or r_null:
            return None
        l, r = num.parse(l_raw), num.parse(r_raw)
        if self.op == "/" and r == num.parse("0"):
            return None
        return num.binop(l, r, self.op)

    def collect_exceptions(self) -> list[ACException]:
        """ac_exception_finder.cpp — full scan per collection, closed
        [lo, hi] membership, one exception object per row carrying every
        violating column pair in collection order, sorted by row."""
        by_row: dict[int, list[tuple[int, int]]] = {}
        for c in self.collections:
            num = _Num(self.types[c.lhs])
            for i in range(len(self.rows)):
                l_null, l_raw = self._cell(i, c.lhs)
                r_null, r_raw = self._cell(i, c.rhs)
                if l_null or r_null:
                    continue
                l, r = num.parse(l_raw), num.parse(r_raw)
                if self.op == "/" and r == num.parse("0"):
                    continue
                v = num.binop(l, r, self.op)
                if not any(lo <= v <= hi for lo, hi in c.ranges):
                    by_row.setdefault(i, []).append((c.lhs, c.rhs))
        return [
            ACException(row, pairs) for row, pairs in sorted(by_row.items())
        ]


# ------------------------------------------------- fixture loading


def load_reference_csv(path: str, has_header: bool) -> list[list[str]]:
    """Reference CSVParser semantics for fixtures: each LINE is
    right-trimmed before field split (csv_parser.cpp:14-15,60 — fields
    keep their own inner/leading whitespace), quoted fields with doubled
    quotes supported, header dropped when present."""
    with open(path, newline="") as f:
        text = f.read()
    lines = [ln.rstrip() for ln in text.splitlines()]
    rows = list(csv.reader(lines))
    return rows[1:] if has_header else rows
