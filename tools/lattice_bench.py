"""Lattice-skip evidence at bench scale (VERDICT r4 #6).

The hybrid/traversal miners' value proposition is NODE-VISIT REDUCTION:
HyFD/HyUCC refute most lattice candidates from a sampled negative cover
before any validation job, and Pyro steers with sample estimates so only
boundary nodes are scored exactly. This tool measures that on a WIDE,
TALL frame — 16 columns × 1M rows (configurable), deterministic modular
arithmetic with a realistic dependency structure (embedded FDs/UCCs,
a composite key, a constant, a bijective pair) — and records, per miner
pair, the exact-scored node counts, wall times, and an output-equality
check against the levelwise baseline.

Writes BENCH_LATTICE.json (merged into BENCH.md by tools/scaling_bench.py)
and prints the JSON. Run SOLO (host timing rules, CLAUDE.md):

    python tools/lattice_bench.py [n_rows] [n_cols]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def wide_frame(spark, n_rows: int, n_cols: int):
    """Deterministic 16-column dependency structure over spark.range:
    composite key (c01,c02), FD chains c01→c07→c08, c02→c09, c06→c13,
    a bijection (c03,c04)↔c10, a constant c14, independent noise mods."""
    from pyspark.sql import functions as F

    i = F.col("id")
    exprs = [
        (i % 1000).alias("c01"),
        (i / 1000).cast("long").alias("c02"),
        (i % 7).alias("c03"),
        (i % 11).alias("c04"),
        (i % 13).alias("c05"),
        (i % 977).alias("c06"),
        ((i % 1000) % 50).alias("c07"),
        ((i % 1000) % 10).alias("c08"),
        ((i / 1000).cast("long") % 23).alias("c09"),
        ((i % 7) + (i % 11) * 7).alias("c10"),
        (i % 2).alias("c11"),
        (i % 3).alias("c12"),
        ((i % 977) % 31).alias("c13"),
        F.lit(1).alias("c14"),
        ((i * 37) % 991).alias("c15"),
        ((i % 991) % 97).alias("c16"),
    ]
    return spark.range(n_rows).select(*exprs[:n_cols])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cols = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from desbordante_spark.session import get_spark

    spark = get_spark(app_name="lattice-bench")
    df = wide_frame(spark, n_rows, n_cols).cache()
    df.count()  # materialize once; every miner reads the cached frame

    from desbordante_spark.discovery.hyfd import discover_fds_hybrid
    from desbordante_spark.discovery.hyucc import discover_uccs_hybrid
    from desbordante_spark.discovery.pfdtane import discover_afds
    from desbordante_spark.discovery.pyro import discover_afds_pyro
    from desbordante_spark.discovery.tane import discover_fds, discover_uccs

    result: dict = {"n_rows": n_rows, "n_cols": n_cols}

    # min-of-k wall times (CLAUDE.md: the host stalls intermittently
    # 5-10x — never trust single-shot timings). The first rep doubles as
    # warmup; node-visit stats come from the final rep (deterministic).
    reps = int(os.environ.get("SPARK_GRAFT_LATTICE_REPS", "2"))

    def timed(fn):
        best = float("inf")
        for _ in range(max(1, reps)):
            t0 = time.monotonic()
            out = fn()
            best = min(best, time.monotonic() - t0)
        return out, round(best, 2)

    # ---- UCC: levelwise vs HyUCC --------------------------------------
    st_lw: dict = {}
    uccs_lw, w_lw = timed(lambda: discover_uccs(df, max_size=3, stats=st_lw))
    st_hy: dict = {}
    uccs_hy, w_hy = timed(
        lambda: discover_uccs_hybrid(df, max_size=3, stats=st_hy)
    )
    result["ucc"] = {
        "found": len(uccs_lw),
        "outputs_equal": sorted(uccs_lw, key=lambda u: (len(u), u))
        == uccs_hy,
        "levelwise": {"exact_scored": st_lw["exact_scored"],
                      "wall_sec": w_lw},
        "hyucc": {"validated": st_hy["validated_candidates"],
                  "agree_sets": st_hy["agree_sets"], "wall_sec": w_hy},
    }
    print("ucc", json.dumps(result["ucc"]), flush=True)

    # ---- FD: levelwise vs HyFD ----------------------------------------
    st_lw = {}
    fds_lw, w_lw = timed(lambda: discover_fds(df, max_lhs=2, stats=st_lw))
    st_hy = {}
    fds_hy, w_hy = timed(
        lambda: discover_fds_hybrid(df, max_lhs=2, stats=st_hy)
    )
    result["fd"] = {
        "found": len(fds_lw),
        "outputs_equal": fds_lw == fds_hy,
        "levelwise": {"exact_scored": st_lw["exact_scored"],
                      "wall_sec": w_lw},
        "hyfd": {"validated": st_hy["validated_candidates"],
                 "agree_sets": st_hy["agree_sets"], "wall_sec": w_hy},
    }
    print("fd", json.dumps(result["fd"]), flush=True)

    # ---- AFD: levelwise vs Pyro traversal (g1) ------------------------
    # the LOW-cardinality projection: with only small-modulus columns the
    # g1 boundary sits at levels 2-3 (level-1 agree fractions ~1/p are too
    # large), the regime the estimate-driven traversal is built for — a
    # high-cardinality LHS makes every level-1 candidate a near-AFD and
    # leaves nothing to skip
    afd_cols = [c for c in
                ["c03", "c04", "c05", "c07", "c08", "c09", "c10",
                 "c11", "c12", "c13", "c14", "c16"]
                if c in df.columns]
    st_lw = {}
    afds_lw, w_lw = timed(lambda: discover_afds(
        df, columns=afd_cols, max_lhs=3, max_error=0.05,
        error_measure="g1", stats=st_lw,
    ))
    st_py = {}
    afds_py, w_py = timed(lambda: discover_afds_pyro(
        df, columns=afd_cols, max_lhs=3, max_error=0.05,
        error_measure="g1", stats=st_py,
    ))
    result["afd"] = {
        "found": len(afds_lw),
        "outputs_equal": afds_lw == afds_py,
        "levelwise": {"exact_scored": st_lw["exact_scored"],
                      "wall_sec": w_lw},
        "pyro": {"exact_scored": st_py["exact_scored"],
                 "estimate_scored": st_py["estimate_scored"],
                 "rounds": st_py["rounds"], "wall_sec": w_py},
    }
    print("afd", json.dumps(result["afd"]), flush=True)

    # ---- AFD deep regime: key column + noise, max_lhs=4 ----------------
    # the shape the traversal is FOR (deep uncovered non-dep subspaces,
    # deps settled at level 1 by a key): levelwise must enumerate every
    # noise-only candidate up to the depth cap; the traversal classifies
    # whole subspaces through maximal non-deps + hitting sets
    from pyspark.sql import functions as F

    deep = spark.range(n_rows).select(
        F.col("id").alias("k"),
        *[(F.xxhash64(F.col("id"), F.lit(i)) % 5).alias(f"x{i}")
          for i in range(7)],
    ).cache()
    deep.count()
    # per_tuple here: pairwise g1 vanishes on deep random combinations
    # (agree-pair mass ~(1/5)^|X|), which would make every deep candidate
    # "hold"; per_tuple keeps the noise space a true non-dep subspace
    st_lw = {}
    dlw, w_lw = timed(lambda: discover_afds(
        deep, max_lhs=4, max_error=0.05, error_measure="per_tuple",
        stats=st_lw,
    ))
    st_py = {}
    dpy, w_py = timed(lambda: discover_afds_pyro(
        deep, max_lhs=4, max_error=0.05, error_measure="per_tuple",
        stats=st_py,
    ))
    result["afd_deep"] = {
        "found": len(dlw),
        "outputs_equal": dlw == dpy,
        "levelwise": {"exact_scored": st_lw["exact_scored"],
                      "wall_sec": w_lw},
        "pyro": {"exact_scored": st_py["exact_scored"],
                 "estimate_scored": st_py["estimate_scored"],
                 "rounds": st_py["rounds"], "wall_sec": w_py},
    }
    print("afd_deep", json.dumps(result["afd_deep"]), flush=True)

    with open(os.path.join(REPO, "BENCH_LATTICE.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
