"""Round-6 fixes: ADVICE findings (compat fd.Pyro error kwargs pass-through,
pairwise agree-set empty-mask invariant) and VERDICT items (wide='pairwise'
default so the agree-set miners run out of the box on 18+-column tables,
combined all-miners driver entries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------- compat fd.Pyro honors error kwargs

def test_compat_fd_pyro_honors_error_kwarg(spark):
    """ADVICE compat.py:196 — fd.algorithms.Pyro is the same bound class as
    afd.algorithms.Pyro in the reference (bind_fd.cpp BindPrimitive), so
    execute(error=0.3) must yield AFDs, not silently-exact FDs."""
    import pandas as pd

    from desbordante_spark.compat import fd as compat_fd

    # k -> v is NOT exact (one dirty row) but holds at g1 <= 0.3, while
    # [] -> v fails even at 0.3 (v is diverse overall) so [k] -> v is the
    # minimal AFD the approximate run must surface
    rows = [(i % 5, f"V{i % 5}" if i != 19 else "V9") for i in range(20)]
    df = pd.DataFrame(rows, columns=["k", "v"])

    exact = compat_fd.algorithms.Pyro()
    exact.load_data(table=df)
    exact.execute()
    exact_set = {str(f) for f in exact.get_fds()}

    approx = compat_fd.algorithms.Pyro()
    approx.load_data(table=df)
    approx.execute(error=0.3)
    approx_set = {str(f) for f in approx.get_fds()}

    # at error=0 the near-FD [k] -> v is refuted by the one dirty row;
    # at error=0.3 it must appear
    assert any("[k] -> v" in s for s in approx_set)
    assert not any("[k] -> v" in s for s in exact_set)
    assert approx_set != exact_set


def test_compat_fd_pyro_default_still_exact(spark, testfd):
    """Without kwargs, fd.Pyro stays exact minimal-FD discovery equal to
    the levelwise miner."""
    from desbordante_spark.compat import fd as compat_fd
    from desbordante_spark.discovery.tane import discover_fds

    pdf = testfd.toPandas()
    algo = compat_fd.algorithms.Pyro()
    algo.load_data(table=pdf)
    algo.execute(max_lhs=2)
    got = {(tuple(f.lhs_indices), f.rhs_index) for f in algo.get_fds()}
    cols = list(pdf.columns)
    want = {
        (tuple(sorted(cols.index(c) for c in lhs)), cols.index(rhs))
        for lhs, rhs in discover_fds(testfd, max_lhs=2)
    }
    assert got == want


# --------------------------- pairwise factory: no empty agree-set entries

def test_pairwise_factory_omits_empty_agree_sets(spark):
    """ADVICE fdep.py:198 — an xxhash64 cluster collision between unequal
    values may produce a candidate pair with exact mask 0; the documented
    invariant is that such pairs are OMITTED (consumers recover them from
    covered < n*(n-1)/2). Simulate by checking the contract directly on a
    table where some pairs agree on nothing."""
    from desbordante_spark.discovery.fdep import (
        compute_agree_sets,
        compute_agree_sets_pairwise,
    )

    rows = [("a", 1), ("a", 2), ("b", 3), ("c", 4)]
    df = spark.createDataFrame(rows, "x string, y int")
    got, n = compute_agree_sets_pairwise(df)
    assert n == 4
    assert all(len(aset) > 0 for aset, _cnt in got)
    want, _ = compute_agree_sets(df)
    assert got == want


# ------------------------------ wide tables run out of the box (pairwise)

def test_agree_set_miners_default_pairwise_on_wide_table(spark):
    """VERDICT #7 — wide='pairwise' is now the default: FDep/FastFDs/
    Depminer run on an 18+-column table without opting in, and agree with
    the levelwise miner."""
    from desbordante_spark.discovery.depminer import discover_fds_depminer
    from desbordante_spark.discovery.fastfds import discover_fds_fastfds
    from desbordante_spark.discovery.fdep import discover_fds_fdep
    from desbordante_spark.discovery.tane import discover_fds

    m = 18
    # c0 determines everything; c1..c5 cycle; rest are near-constant
    rows = [
        tuple([i] + [i % 3 if j <= 5 else j for j in range(1, m)])
        for i in range(12)
    ]
    schema = ", ".join(f"c{j} int" for j in range(m))
    df = spark.createDataFrame(rows, schema)
    want = discover_fds(df, max_lhs=1)
    for miner in (
        discover_fds_fdep,
        discover_fds_fastfds,
        discover_fds_depminer,
    ):
        assert miner(df, max_lhs=1) == want, miner.__name__


def test_agree_set_cover_budget_guard_still_raises(spark):
    """Past pair_budget the pairwise path must still hard-fail with the
    hybrid-miner hint."""
    from desbordante_spark.discovery.fdep import discover_fds_fdep

    rows = [tuple(1 for _ in range(18)) for _ in range(60)]
    schema = ", ".join(f"c{j} int" for j in range(18))
    df = spark.createDataFrame(rows, schema)
    with pytest.raises(ValueError, match="pair_budget"):
        discover_fds_fdep(df, pair_budget=100)


def test_fdmine_runs_at_18_columns(spark):
    """FD_Mine's static width guard is now 24 (driver lattice is key/
    equivalence-pruned; masks are Python big-ints) so 18 columns work."""
    from desbordante_spark.discovery.fd_mine import (
        discover_fds_fdmine_minimized,
    )
    from desbordante_spark.discovery.tane import discover_fds

    m = 18
    rows = [
        tuple([i] + [i % 3 if j <= 3 else 7 for j in range(1, m)])
        for i in range(9)
    ]
    schema = ", ".join(f"c{j} int" for j in range(m))
    df = spark.createDataFrame(rows, schema)
    got = discover_fds_fdmine_minimized(df, max_lhs=1)
    assert got == discover_fds(df, max_lhs=1)


# ------------------------------------------- ANN plan-shape fixes (VERDICT)

def _plan_text(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _vectors(spark, n=40, dim=8):
    import math

    rows = [
        (i, [math.sin(i * (j + 1) * 0.7) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_ivf_assign_is_shuffle_free(spark):
    """VERDICT #2 — ivf_assign must not materialize |corpus|×k rows through
    an Exchange+Sort: the row-local argmax plan has NO Exchange and NO
    Window at all."""
    from desbordante_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    vectors = _vectors(spark)
    cents = ivf_centroids(vectors, "vec_id", k=4)
    assigned = ivf_assign(vectors, cents, "vec_id")
    plan = _plan_text(assigned)
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    # every row keeps exactly one assignment, ids within range
    got = assigned.collect()
    assert len(got) == 40
    assert all(0 <= r["centroid_id"] < 4 for r in got)


def test_ivf_assign_matches_window_argmax(spark):
    """The literal-array argmax must agree with the reference per-id window
    argmax (cosine desc, centroid_id asc on ties) bit-for-bit."""
    from pyspark.sql import Window

    from desbordante_spark.operators.similarity import (
        _dot,
        _norm,
        ivf_assign,
        ivf_centroids,
    )

    vectors = _vectors(spark, n=60)
    cents = ivf_centroids(vectors, "vec_id", k=5)
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(vectors, cents, "vec_id").collect()
    }
    v = F.col("embedding")
    cos = (
        _dot(v, F.col("cvec"))
        / F.when(_norm(v) * _norm(F.col("cvec")) > 0,
                 _norm(v) * _norm(F.col("cvec"))).otherwise(F.lit(1.0))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("_cos").desc(), F.col("centroid_id").asc()
    )
    want = {
        r["vec_id"]: r["centroid_id"]
        for r in (
            vectors.crossJoin(F.broadcast(cents))
            .withColumn("_cos", cos)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .collect()
        )
    }
    assert got == want


def test_topk_two_level_cut_and_equivalence(spark):
    """VERDICT #3 — the per-query top-k runs as a salted two-level cut (two
    Window nodes in the plan, the first partitioned by (query_id, _salt))
    and yields exactly the single-window result."""
    from pyspark.sql import Window

    from desbordante_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    vectors = _vectors(spark, n=50)
    queries = vectors.limit(3)
    out = cosine_topk_bruteforce(
        queries, vectors, "vec_id", "vec_id", k=5
    )
    plan = _plan_text(out)
    assert plan.count("Window") >= 2, plan
    assert "_salt" in plan, plan
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in out.collect()
    }
    # reference single-window cut
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qv"))
    c = vectors.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("cv"))
    from desbordante_spark.operators.similarity import _dot, _norm

    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("qv"), F.col("cv"))
             / F.when(_norm(F.col("qv")) * _norm(F.col("cv")) > 0,
                      _norm(F.col("qv")) * _norm(F.col("cv")))
             .otherwise(F.lit(1.0))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5).collect()
    }
    assert got == want


# -------------------------------------- real stdlib media decode (VERDICT)

def _ppm_bytes(width: int, height: int) -> bytes:
    return (
        b"P6\n# synthetic fixture\n"
        + f"{width} {height}\n255\n".encode()
        + bytes(width * height * 3)
    )


def _wav_bytes(sample_rate: int, channels: int, n_samples: int) -> bytes:
    import struct

    bits = 16
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    body = bytes(n_samples * block_align)
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        block_align, bits,
    )
    data = struct.pack("<4sI", b"data", len(body)) + body
    riff_body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(riff_body)) + riff_body


def test_decode_ppm_header():
    from desbordante_spark.functions.media import decode_ppm_header

    assert decode_ppm_header(_ppm_bytes(320, 200)) == (320, 200)
    # comments between any tokens, CR line ends, P5 grayscale
    assert decode_ppm_header(b"P5 #c\n# another\n 7\n#x\n9 255 ") == (7, 9)
    with pytest.raises(ValueError):
        decode_ppm_header(b"JFIF....")
    with pytest.raises(ValueError):
        decode_ppm_header(b"P6\n640")  # truncated


def test_decode_wav_header():
    from desbordante_spark.functions.media import decode_wav_header

    # 2 s of 16-bit mono at 8 kHz
    rate, ch, ms = decode_wav_header(_wav_bytes(8000, 1, 16000))
    assert (rate, ch, ms) == (8000, 1, 2000)
    # stereo 44.1 kHz, 0.5 s
    rate, ch, ms = decode_wav_header(_wav_bytes(44100, 2, 22050))
    assert (rate, ch, ms) == (44100, 2, 500)
    with pytest.raises(ValueError):
        decode_wav_header(b"RIFFxxxxAVI ")
    with pytest.raises(ValueError):
        decode_wav_header(b"\x00" * 64)


def test_media_metadata_real_decode(spark):
    """VERDICT #5 — use_stub=False is a REAL decode for Netpbm/WAVE
    payloads through the same mapInPandas plumbing."""
    from desbordante_spark.functions.media import decode_media_metadata

    rows = [
        ("img1", "image", _ppm_bytes(640, 480)),
        ("img2", "image", _ppm_bytes(32, 8)),
        ("aud1", "audio", _wav_bytes(16000, 1, 48000)),  # 3 s
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, media_kind string, payload binary"
    )
    got = {
        r["media_ref"]: r
        for r in decode_media_metadata(df, use_stub=False).collect()
    }
    assert (got["img1"]["width"], got["img1"]["height"]) == (640, 480)
    assert (got["img2"]["width"], got["img2"]["height"]) == (32, 8)
    assert got["aud1"]["duration_ms"] == 3000
    assert got["img1"]["byte_len"] == len(_ppm_bytes(640, 480))


def test_media_metadata_real_decode_unknown_format_raises(spark):
    """Compressed formats still fail loudly — honest partiality."""
    from desbordante_spark.functions.media import decode_media_metadata

    df = spark.createDataFrame(
        [("x", "image", b"\x89PNG\r\n\x1a\n....")],
        "media_ref string, media_kind string, payload binary",
    )
    with pytest.raises(Exception) as ei:
        decode_media_metadata(df, use_stub=False).collect()
    assert "no stdlib decoder" in str(ei.value)


# ----------------------- snapshot-delta incremental verify ≡ full recompute

def test_incremental_fd_verify_equals_full_recompute(spark):
    """VERDICT #8 — fd_apply_incremental (touched-LHS-only updates with
    carried totals) must match a from-scratch state build + full metric
    rollup bit-for-bit across a sequence of insert/delete snapshot deltas."""
    from desbordante_spark.operators.dynamic import (
        fd_apply_incremental,
        fd_metrics_from_state,
        fd_state_init,
        fd_totals_from_state,
        metrics_row_from_totals,
    )

    lhs, rhs = ["k"], ["v"]
    base_rows = [(i, f"k{i % 7}", f"v{i % 7}") for i in range(60)]
    base = spark.createDataFrame(base_rows, "rid int, k string, v string")
    state = fd_state_init(base, lhs, rhs).localCheckpoint(eager=True)
    totals = fd_totals_from_state(state, lhs)

    # batch 1: inserts that dirty two clusters; batch 2: deletes that clean
    # one and shrink another; batch 3: mixed upsert (delete old + insert new)
    batches = [
        ([("x", "k1", "DIRTY"), ("y", "k2", "DIRTY"), ("z", "k9", "v9")],
         []),
        ([], [("x", "k1", "DIRTY"), ("a", "k3", "v3")]),
        ([("u", "k2", "v2")], [("y", "k2", "DIRTY")]),
    ]
    # logical multiset of (k, v) pairs — rid is not part of the state
    cur_kv = [(k, v) for _rid, k, v in base_rows]
    for ins_rows, del_rows in batches:
        ins = (
            spark.createDataFrame(ins_rows, "rid string, k string, v string")
            if ins_rows else None
        )
        dele = (
            spark.createDataFrame(del_rows, "rid string, k string, v string")
            if del_rows else None
        )
        state, totals = fd_apply_incremental(
            state, lhs, rhs, totals, inserts=ins, deletes=dele
        )
        state = state.localCheckpoint(eager=True)
        got = metrics_row_from_totals(totals)

        # full recompute on the logical current table
        cur_kv.extend((k, v) for _rid, k, v in ins_rows)
        for _rid, k, v in del_rows:
            cur_kv.remove((k, v))
        cur = spark.createDataFrame(cur_kv, "k string, v string")
        full_state = fd_state_init(cur, lhs, rhs)
        want = fd_metrics_from_state(full_state, lhs).collect()[0].asDict()
        assert got == want, (got, want)
        # state equivalence, not just verdict equivalence
        assert sorted(map(tuple, state.collect())) == sorted(
            map(tuple, full_state.collect())
        )


def test_incremental_ucc_verify_equals_full_recompute(spark):
    from desbordante_spark.operators.dynamic import (
        metrics_row_from_totals,
        ucc_metrics_from_state,
        ucc_state_init,
        ucc_apply_incremental,
        ucc_totals_from_state,
    )

    base = spark.createDataFrame(
        [(f"d{i}",) for i in range(50)] + [("d1",)], "doc_id string"
    )
    state = ucc_state_init(base, ["doc_id"]).localCheckpoint(eager=True)
    totals = ucc_totals_from_state(state)

    ins = spark.createDataFrame([("d2",), ("dNEW",)], "doc_id string")
    dele = spark.createDataFrame([("d1",)], "doc_id string")
    state, totals = ucc_apply_incremental(
        state, ["doc_id"], totals, inserts=ins, deletes=dele
    )
    got = metrics_row_from_totals(totals)

    cur = spark.createDataFrame(
        [(f"d{i}",) for i in range(50)] + [("d2",), ("dNEW",)],
        "doc_id string",
    )
    want = (
        ucc_metrics_from_state(ucc_state_init(cur, ["doc_id"]))
        .collect()[0].asDict()
    )
    assert got == want
    # d2 is now the only duplicate
    assert got["num_violating_clusters"] == 1
    assert got["num_violating_rows"] == 2


# ----------------------------------- combined driver entries stay coherent

def test_combined_driver_entries_match_components(spark):
    """The combined fd/ucc all-miners driver rows must equal the union of
    the per-miner entries (same data, an algorithm label per row)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry6", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sf = "/root/testdata/sf0.001"
    qs = mod.queries()

    combined = {
        (r["algorithm"], r["lhs"], r["rhs"])
        for r in qs["fd_discovery_all_miners_orders"](spark, sf).collect()
    }
    base = {
        (r["lhs"], r["rhs"])
        for r in qs["fd_discovery_orders"](spark, sf).collect()
    }
    assert combined == {
        (alg, lhs, rhs)
        for alg in mod._FD_MINER_NAMES
        for lhs, rhs in base
    }

    ucc_combined = {
        (r["algorithm"], r["ucc"])
        for r in qs["ucc_discovery_all_orders"](spark, sf).collect()
    }
    ucc_base = {
        r["ucc"] for r in qs["ucc_discovery_orders"](spark, sf).collect()
    }
    assert ucc_combined == {
        (alg, u) for alg in ("tane", "hyucc") for u in ucc_base
    }

    # the driver records exactly the first 50 entries: every entry must
    # have an oracle, and the first 50 must include one row per family
    keys = list(qs)
    assert len(keys) >= 50
    assert set(mod.oracle_sql()) >= set(keys)
    first50 = set(keys[:50])
    for must in (
        "fd_discovery_all_miners_orders",
        "ucc_discovery_all_orders",
        "afd_discovery_pyro_orders",
        "aucc_discovery_orders",
        "ind_discovery_nary_approx",
        "ind_discovery_aind_nulls",
        "near_dup_minhash_documents",
        "typo_candidates_cities",
        "typed_rank_mixedfmt",
        "gfd_dot_directors",
        "dd_discovery_supplier",
        "cfd_discovery_orders",
        "dynamic_fd_incremental_orders",
        "profile_incremental_documents",
    ):
        assert must in first50, must


# --------------------------- faithful PyroUCC traversal (last standin closed)

def test_aucc_pyro_equals_levelwise_crafted(spark):
    """The estimate-guided traversal (discover_auccs_pyro — pyroucc.cpp's
    single SearchSpace with KeyG1Strategy) must emit the IDENTICAL
    minimal-AUCC set with identical exact errors as the levelwise miner,
    at every threshold and arity cap."""
    from desbordante_spark.discovery.aucc import (
        discover_auccs,
        discover_auccs_pyro,
    )

    rows = [("a", "x", 1), ("a", "x", 2), ("b", "y", 1), ("b", "z", 2),
            ("c", "z", 3), ("c", "z", 3), (None, None, None)]
    df = spark.createDataFrame(rows, "c1 string, c2 string, c3 int")
    for max_error in (0.0, 0.05, 0.1, 0.3, 1.0):
        for max_size in (1, 2, 3):
            a = discover_auccs(df, max_size=max_size, max_error=max_error)
            b = discover_auccs_pyro(
                df, max_size=max_size, max_error=max_error
            )
            assert a == b, (max_error, max_size, a, b)


def test_aucc_pyro_equals_levelwise_orders(spark):
    """Equivalence on real data (sf0.001 orders) across thresholds, plus
    the node-visit evidence: the traversal exact-scores FEWER nodes than
    the levelwise enumeration's candidate count."""
    from desbordante_spark.discovery.aucc import (
        discover_auccs,
        discover_auccs_pyro,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"]
    n_level_candidates = 4 + 6  # singletons + all pairs (worst case)
    for max_error in (0.0, 0.001, 0.2):
        a = discover_auccs(
            orders, columns=cols, max_size=2, max_error=max_error
        )
        stats: dict = {}
        b = discover_auccs_pyro(
            orders, columns=cols, max_size=2, max_error=max_error,
            stats=stats,
        )
        assert a == b, (max_error, a, b)
        assert stats["exact_scored"] < n_level_candidates, stats


def test_aucc_pyro_edge_inputs(spark):
    """Empty table and single row match the levelwise miner (n <= 1 makes
    every non-empty set an exact UCC; columns=[] falls back to all columns
    in both miners — the shared ``columns or df.columns`` convention)."""
    from desbordante_spark.discovery.aucc import (
        discover_auccs,
        discover_auccs_pyro,
    )

    empty = spark.createDataFrame([], "c1 string, c2 int")
    assert discover_auccs_pyro(empty) == discover_auccs(empty)
    one = spark.createDataFrame([("a", 1)], "c1 string, c2 int")
    assert discover_auccs_pyro(one) == discover_auccs(one)
    assert discover_auccs_pyro(one, columns=[]) == discover_auccs(
        one, columns=[]
    )


def test_compat_pyroucc_honors_error_kwarg(spark):
    """ucc.algorithms.PyroUCC registers kErrorOpt in the reference
    (pyroucc.cpp:29 / config/error/option.cpp:9, default 0.0): at error=0
    it must equal the exact miners; with error>0 it must surface a
    near-unique column the exact run rejects."""
    import pandas as pd

    from desbordante_spark.compat import ucc as compat_ucc

    # k is unique except ONE duplicated value pair -> error 2/(n*(n-1));
    # (k, v) is exactly unique
    rows = [(i if i != 19 else 0, i // 2) for i in range(20)]
    df = pd.DataFrame(rows, columns=["k", "v"])

    exact = compat_ucc.algorithms.PyroUCC()
    exact.load_data(table=df)
    exact.execute(max_lhs=2)
    exact_set = {tuple(u.lhs_indices) for u in exact.get_uccs()}

    hy = compat_ucc.algorithms.HyUCC()
    hy.load_data(table=df)
    hy.execute(max_lhs=2)
    assert exact_set == {tuple(u.lhs_indices) for u in hy.get_uccs()}
    assert (0,) not in exact_set  # k alone is NOT exactly unique

    approx = compat_ucc.algorithms.PyroUCC()
    approx.load_data(table=df)
    approx.execute(max_lhs=2, error=0.1)
    approx_set = {tuple(u.lhs_indices) for u in approx.get_uccs()}
    assert (0,) in approx_set  # near-unique k qualifies at error=0.1


def test_aucc_driver_entry_covers_both_miners(spark):
    """The driver row aucc_discovery_orders now carries an algorithm label
    per miner, both pinned to the same minimal-AUCC set."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_r6b", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sf = "/root/testdata/sf0.001"
    rows = mod.queries()["aucc_discovery_orders"](spark, sf).collect()
    by_alg: dict = {}
    for r in rows:
        by_alg.setdefault(r["algorithm"], set()).add(
            (r["aucc"], r["error"])
        )
    assert set(by_alg) == {"levelwise", "pyro"}
    assert by_alg["levelwise"] == by_alg["pyro"]


# ------------------------- real raster/PCM kernels (stubs retired, round 6)

def test_decode_pnm_pixels_all_formats():
    from desbordante_spark.functions.media import decode_pnm_pixels

    # P6 RGB binary: luma = channel mean / maxval
    p6 = b"P6\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255]
    )
    w, h, luma = decode_pnm_pixels(p6)
    assert (w, h) == (2, 2)
    assert luma == pytest.approx([1 / 3, 1 / 3, 1 / 3, 1.0])

    # P5 grayscale, 2-byte big-endian samples (maxval > 255)
    p5 = b"P5 1 2 65535 " + bytes([0, 0, 255, 255])
    assert decode_pnm_pixels(p5)[2] == pytest.approx([0.0, 1.0])

    # P2 ASCII grayscale with maxval scaling
    p2 = b"P2\n2 2\n100\n0 50\n100 100\n"
    assert decode_pnm_pixels(p2)[2] == pytest.approx([0.0, 0.5, 1.0, 1.0])

    # P1 ASCII bitmap, unseparated bits (1 = black = luma 0)
    p1 = b"P1\n2 2\n0110\n"
    assert decode_pnm_pixels(p1)[2] == pytest.approx([1.0, 0.0, 0.0, 1.0])

    # P4 packed binary bitmap: 0xAA = 10101010
    p4 = b"P4\n8 1\n" + bytes([0b10101010])
    assert decode_pnm_pixels(p4)[2] == pytest.approx(
        [0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0]
    )

    # P3 ASCII RGB
    p3 = b"P3 1 1 255  255 0 0"
    assert decode_pnm_pixels(p3)[2] == pytest.approx([1 / 3])

    with pytest.raises(ValueError):
        decode_pnm_pixels(b"P6\n2 2\n255\n\x00\x00")  # truncated raster


def _pcm16_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    import struct

    body = b"".join(struct.pack("<h", s) for s in samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
                      byte_rate, channels * 2, 16)
    data = struct.pack("<4sI", b"data", len(body)) + body
    riff = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(riff)) + riff


def test_decode_wav_samples():
    from desbordante_spark.functions.media import decode_wav_samples

    # mono square wave at half amplitude
    wav = _pcm16_wav(8000, 1, [16384, -16384] * 50)
    rate, mono = decode_wav_samples(wav)
    assert rate == 8000 and len(mono) == 100
    assert mono[0] == pytest.approx(0.5) and mono[1] == pytest.approx(-0.5)

    # stereo: L/R opposite phases cancel in the mono mix
    wav2 = _pcm16_wav(16000, 2, [16384, -16384] * 10)
    _rate, mono2 = decode_wav_samples(wav2)
    assert mono2 == pytest.approx([0.0] * 10)

    with pytest.raises(NotImplementedError):
        # format tag 85 (MP3-in-WAV) needs a codec
        import struct as st

        fmt = st.pack("<4sIHHIIHH", b"fmt ", 16, 85, 1, 8000, 8000, 1, 16)
        bad = st.pack("<4sI", b"RIFF", 4 + len(fmt)) + b"WAVE" + fmt
        decode_wav_samples(bad)


def test_split_pnm_frames_and_real_frame_sampling(spark):
    from desbordante_spark.functions.media import (
        decode_pnm_pixels,
        sample_video_frames,
        split_pnm_frames,
    )

    frames = [b"P5 1 1 255 " + bytes([v]) for v in (10, 20, 30, 40, 50)]
    stream = b"".join(frames)
    spans = split_pnm_frames(stream)
    assert len(spans) == 5
    assert [stream[lo:hi] for lo, hi in spans] == frames

    df = spark.createDataFrame(
        [("vid1", stream)], "media_ref string, payload binary"
    )
    got = sorted(
        (r["frame_idx"], bytes(r["frame"]))
        for r in sample_video_frames(df, n_frames=2, use_stub=False)
        .collect()
    )
    # even sampling over 5 frames at n=2 -> indices 0 and 2
    assert got == [(0, frames[0]), (2, frames[2])]
    # each emitted frame is a standalone decodable Netpbm file
    assert decode_pnm_pixels(got[1][1])[2] == pytest.approx([30 / 255])

    with pytest.raises(Exception, match="NotImplementedError|frame"):
        sample_video_frames(
            spark.createDataFrame(
                [("x", b"\x00\x00ftypmp42....")],
                "media_ref string, payload binary",
            ),
            use_stub=False,
        ).collect()


def test_real_media_features(spark):
    from desbordante_spark.functions.media import extract_media_features

    p6 = b"P6\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255]
    )
    wav = _pcm16_wav(8000, 1, [16384, -16384] * 50)
    df = spark.createDataFrame(
        [("img", p6), ("aud", wav)], "media_ref string, payload binary"
    )
    got = {
        r["media_ref"]: list(r["features"])
        for r in extract_media_features(df, dim=2, use_stub=False).collect()
    }
    # image: mean luma per half of the raster scan
    assert got["img"] == pytest.approx([1 / 3, 2 / 3])
    # audio: RMS of a half-amplitude square wave is 0.5 in every bucket
    assert got["aud"] == pytest.approx([0.5, 0.5])


def test_aucc_auto_routing(spark):
    """discover_auccs_auto routes dense level-1 boundaries to levelwise
    and sparse ones to the traversal, with identical output either way."""
    from desbordante_spark.discovery.aucc import (
        discover_auccs,
        discover_auccs_auto,
    )

    # dense: both columns are near-unique -> both singletons qualify
    dense_rows = [(i, i if i != 9 else 0) for i in range(10)]
    dense = spark.createDataFrame(dense_rows, "a int, b int")
    st: dict = {}
    got = discover_auccs_auto(dense, max_size=2, max_error=0.1, stats=st)
    assert st["chosen"] == "levelwise" and st["density"] == 1.0
    assert got == discover_auccs(dense, max_size=2, max_error=0.1)

    # sparse: low-cardinality singletons all fail; the pair is unique
    sparse_rows = [(i % 4, i // 4) for i in range(16)]
    sparse = spark.createDataFrame(sparse_rows, "a int, b int")
    st = {}
    got = discover_auccs_auto(sparse, max_size=2, max_error=0.01, stats=st)
    assert st["chosen"] == "traversal" and st["density"] == 0.0
    assert got == discover_auccs(sparse, max_size=2, max_error=0.01)

    # max_size=1: answered without a routing probe
    st = {}
    got = discover_auccs_auto(dense, max_size=1, max_error=0.1, stats=st)
    assert st["chosen"] == "levelwise" and st["density"] is None
    assert got == discover_auccs(dense, max_size=1, max_error=0.1)


def test_top_k_plan_is_partial_topk(spark):
    """top_k_words / top_k_chars must never sort the full vocabulary in
    one reducer: the plan is TakeOrderedAndProject (per-partition top-k,
    k-row merge), and the only Window runs over the k survivors."""
    from desbordante_spark.operators.stats import top_k_chars, top_k_words

    df = spark.createDataFrame(
        [("the quick brown fox the lazy dog the end",),
         ("quick brown quick",), (None,), ("",)],
        "text string",
    )
    for fn, key in ((top_k_words, "word"), (top_k_chars, "ch")):
        out = fn(df, "text", k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan
        # the window sits ABOVE the limit (ranks only k rows)
        assert plan.index("Window") < plan.index("TakeOrderedAndProject")
        rows = out.collect()
        assert [r["rank"] for r in rows] == [1, 2, 3]
        # 'the' and 'quick' tie at 3; word-asc tie-break puts 'quick' first
        assert rows[0][key] in ("quick", " ")


def test_typed_rank_encode_distributed_path_equivalence(spark):
    """Above small_table_rows, typed_rank_encode swaps each column's
    global dense_rank window (single-reducer sort of the whole table)
    for a distinct-set rank + null-safe join-back. Both paths must
    produce identical ranks, and the big path's executed plan must not
    funnel the full table through an unpartitioned Window."""
    from desbordante_spark.discovery.fastod_encode import typed_rank_encode

    rows = [
        (i,
         str(i % 97),                                   # int-typed
         f"w{i % 53}",                                  # string-typed
         None if i % 11 == 0 else f"{(i * 37) % 500}.25")  # double + nulls
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "rid int, a string, b string, c string")
    small = typed_rank_encode(df, ["a", "b", "c"])
    big = typed_rank_encode(df, ["a", "b", "c"], small_table_rows=100)
    assert sorted(map(tuple, small.collect())) == \
        sorted(map(tuple, big.collect()))
    plan = big._jdf.queryExecution().executedPlan().toString()
    # the ranked sides are checkpointed; the remaining plan is joins —
    # no Window node may touch the full-table side
    assert "Window" not in plan, plan
