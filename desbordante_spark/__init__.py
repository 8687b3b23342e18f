"""desbordante_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the capabilities of Mstrutov/Desbordante
(reference at /root/reference, C++17 data profiler) as idiomatic PySpark:

- Verification primitives: UCC/AUCC, FD/AFD, metric FD, order-dependency,
  conditional FD, referential (IND/AIND), algebraic-constraint verification —
  each returning (holds, error, violation counts) plus a lazy *violation
  DataFrame* with cluster/highlight-style evidence, mirroring the reference's
  verifier getters (src/core/algorithms/fd/fd_verifier/fd_verifier.h:16-57,
  src/core/algorithms/ucc/ucc_verifier/ucc_verifier.h:20-40).
- Column statistics profiler (src/core/algorithms/statistics/data_stats.h) as
  one-pass multi-aggregate DataFrame jobs.
- Distribution-drift detection (KS / chi-square over histogram sketches) and
  the interleaved-document span-sequence invariant — BASELINE.json north-rule
  extensions beyond the reference.
- Training-data pipeline ops: exact / MinHash-LSH / SimHash / n-gram-Jaccard
  dedup, embedding cosine similarity search, text quality analysis.
- A ``desbordante``-compatible API facade (``desbordante_spark.compat``):
  reference scripts port by changing one import.

All operators are declarative DataFrame plans (Catalyst-optimized, JVM-side
whole-stage codegen); pandas/Arrow UDFs only where built-ins cannot express
the semantics; zero per-row Python UDFs.
"""

from desbordante_spark.model import (
    FDResult,
    INDResult,
    MFDResult,
    UCCResult,
    VerificationResult,
)
from desbordante_spark.operators.drift import quantile_drift
from desbordante_spark.operators.fd import fd_verify, fd_violations
from desbordante_spark.operators.ind import ind_verify
from desbordante_spark.operators.mfd import mfd_verify
from desbordante_spark.operators.profile_state import (
    drift_from_state,
    hist_apply_incremental,
    hist_state_init,
    profile_apply_incremental,
    profile_from_state,
    profile_state_init,
)
from desbordante_spark.operators.schema_infer import type_profile
from desbordante_spark.operators.ucc import ucc_verify, ucc_violations

__all__ = [
    "VerificationResult",
    "UCCResult",
    "FDResult",
    "INDResult",
    "MFDResult",
    "ucc_verify",
    "ucc_violations",
    "fd_verify",
    "fd_violations",
    "ind_verify",
    "mfd_verify",
    "type_profile",
    "quantile_drift",
    "profile_state_init",
    "profile_apply_incremental",
    "profile_from_state",
    "hist_state_init",
    "hist_apply_incremental",
    "drift_from_state",
]

__version__ = "0.1.0"
