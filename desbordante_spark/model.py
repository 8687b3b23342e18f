"""Result model mirroring the reference's verifier surfaces.

Reference result surfaces (all file:line cites are into /root/reference):

- FD verify: ``fd_holds() / get_error() / get_num_error_clusters() /
  get_num_error_rows() / get_highlights()``
  (src/python_bindings/fd/bind_fd_verification.cpp:21-31,
  src/core/algorithms/fd/fd_verifier/fd_verifier.h:16-57).
- UCC verify: ``ucc_holds() / get_num_clusters_violating_ucc() /
  get_num_rows_violating_ucc() / get_clusters_violating_ucc() / get_error()``
  (src/python_bindings/ucc/bind_ucc_verification.cpp:20-24).
- MFD verify: ``mfd_holds() / get_highlights()``
  (src/python_bindings/mfd/bind_mfd_verification.cpp:21-27).

Here each verify returns a small dataclass of scalar verdict metrics plus a
**lazy violation DataFrame** (the scalable analog of the reference's
highlight/cluster lists, which materialize full row-index vectors in memory —
src/core/algorithms/fd/fd_verifier/highlight.h:11-35). Evidence row lists are
capped (``evidence_cap``) while all counts stay exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame


def as_cols(x) -> list[str]:
    """Normalize a column-set argument: a bare string means ONE column.

    Every verifier takes ``Sequence[str]`` column sets; without this guard
    a caller passing ``"o_custkey"`` would have the string iterated
    character-by-character into nonsense column names (and fail with an
    unrelated UNRESOLVED_COLUMN error deep inside the plan)."""
    if isinstance(x, str):
        return [x]
    return list(x)


@dataclass
class VerificationResult:
    """Base verdict: pass/fail + error measure + violation evidence."""

    holds: bool
    error: float
    num_violating_clusters: int
    num_violating_rows: int
    total_rows: int
    #: lazy evidence DataFrame; schema depends on the constraint kind
    violations: Optional[DataFrame] = None
    #: constraint-specific extras (thresholds, per-partition rows, ...)
    details: dict[str, Any] = field(default_factory=dict)


@dataclass
class UCCResult(VerificationResult):
    """UCC/AUCC verdict. ``error`` is the AUCC measure
    ``sum_c c*(c-1) / (n*(n-1))`` over violating clusters
    (ucc/ucc_verifier/ucc_stats_calculator.h:31-45)."""

    columns: tuple[str, ...] = ()


@dataclass
class FDResult(VerificationResult):
    """FD/AFD verdict. ``error`` is g1: conflicting ordered pairs over
    ``n^2 - n`` (fd/fd_verifier/stats_calculator.cpp:61-84, formula :83).
    For AFD, ``holds`` compares g1 to ``details['error_threshold']``
    (fd_verifier.h:64-67)."""

    lhs: tuple[str, ...] = ()
    rhs: tuple[str, ...] = ()


@dataclass
class INDResult(VerificationResult):
    """IND/AIND verdict (referential check). ``error`` is the AIND measure:
    fraction of distinct LHS values missing from RHS
    (ind/spider/attribute.cpp:10-21). ``num_violating_clusters`` = # missing
    distinct values; ``num_violating_rows`` = # rows referencing them."""

    lhs: tuple[str, ...] = ()
    rhs: tuple[str, ...] = ()


@dataclass
class MFDResult(VerificationResult):
    """Metric FD verdict (metric/metric_verifier.h:32-39). ``error`` here is
    the fraction of LHS clusters exceeding the tolerance ``parameter``."""

    lhs: tuple[str, ...] = ()
    rhs: tuple[str, ...] = ()
    metric: str = "euclidean"
    parameter: float = 0.0
