"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship verification suite slice on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for EVERY query key (64/64, no
rows-only checks): computed columns aliased identically on both sides,
integer/rational outputs preferred, float folds mirrored via
``list_reduce`` (left fold ≡ ``F.aggregate``), LSH planes / IVF centroids
md5-derived so they regenerate in SQL, and queries over generated tables
staged once to ``/tmp/spark_graft_stage`` parquet that both engines read
(see CLAUDE.md oracle-match rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------- staged generated tables
#
# The interleaved-doc generator is deterministic (seed-derived, FIXTURES.md
# F1/F2) but xxhash64-based, so DuckDB can't regenerate it in SQL. Queries
# over generated data therefore stage the table to parquet once and BOTH
# engines read the same files (the driver runs the Spark query before its
# oracle, so the stage exists by the time DuckDB reads it; the _SUCCESS
# guard makes re-runs free).

_STAGE_ROOT = "/tmp/spark_graft_stage"
_STAGE_DOCS = 20_000
_DOCS_PATH = f"{_STAGE_ROOT}/docs{_STAGE_DOCS}"
_CAT_PATH = f"{_STAGE_ROOT}/mediacat{max(100, _STAGE_DOCS // 10)}"


def _staged_docs(spark: SparkSession) -> DataFrame:
    import os

    if not os.path.exists(f"{_DOCS_PATH}/_SUCCESS"):
        from desbordante_spark.sources.interleaved import generate_documents

        generate_documents(spark, _STAGE_DOCS).write.mode("overwrite").parquet(
            _DOCS_PATH
        )
    return spark.read.parquet(_DOCS_PATH)


_DOCS_CLEAN_PATH = f"{_STAGE_ROOT}/docs{_STAGE_DOCS}_clean"


def _staged_docs_clean(spark: SparkSession) -> DataFrame:
    """Same generated table with span-order violations disabled — the
    reference-parity twin for the span-sequence equality check."""
    import os

    if not os.path.exists(f"{_DOCS_CLEAN_PATH}/_SUCCESS"):
        from desbordante_spark.sources.interleaved import generate_documents

        generate_documents(
            spark, _STAGE_DOCS, offset_viol_every=0
        ).write.mode("overwrite").parquet(_DOCS_CLEAN_PATH)
    return spark.read.parquet(_DOCS_CLEAN_PATH)


def _staged_catalog(spark: SparkSession) -> DataFrame:
    import os

    if not os.path.exists(f"{_CAT_PATH}/_SUCCESS"):
        from desbordante_spark.sources.interleaved import generate_media_catalog

        generate_media_catalog(
            spark, max(100, _STAGE_DOCS // 10)
        ).write.mode("overwrite").parquet(_CAT_PATH)
    return spark.read.parquet(_CAT_PATH)


# ---------------------------------------------------------------- queries

def _q_ucc_violations_orders_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.ucc import ucc_violations

    return ucc_violations(_read(spark, sf_dir, "orders"), ["o_custkey"])


def _q_ucc_metrics_orders_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.ucc import ucc_metrics_df

    return ucc_metrics_df(_read(spark, sf_dir, "orders"), ["o_custkey"])


def _q_ucc_metrics_lineitem_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.ucc import ucc_metrics_df

    return ucc_metrics_df(
        _read(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber"]
    )


def _q_fd_violations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.fd import fd_violations

    return fd_violations(
        _read(spark, sf_dir, "orders"), ["o_custkey"], ["o_orderpriority"]
    )


def _q_fd_metrics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.fd import fd_metrics_df
    from desbordante_spark.sources.readers import spread_small_input_by

    # o_custkey is near-unique per order row, so partial aggregation cannot
    # compress the cluster stage — by-key spread parallelizes the serial
    # single-file scan with the one shuffle the query needs anyway (no-op
    # when the scan already fans out). Same operator, same results.
    src = spread_small_input_by(
        _read(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority"),
        ["o_custkey"],
    )
    return fd_metrics_df(src, ["o_custkey"], ["o_orderpriority"])


def _q_afd_metrics_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.fd import fd_metrics_df

    return fd_metrics_df(
        _read(spark, sf_dir, "lineitem"),
        ["l_partkey"],
        ["l_suppkey"],
        error_threshold=0.05,
    )


def _q_ind_metrics_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.ind import ind_metrics_df

    return ind_metrics_df(
        _read(spark, sf_dir, "lineitem"), ["l_orderkey"],
        _read(spark, sf_dir, "orders"), ["o_orderkey"],
    )


def _q_ind_missing_events_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.ind import ind_missing_values

    return ind_missing_values(
        _read(spark, sf_dir, "events"), ["user_id"],
        _read(spark, sf_dir, "customer"), ["c_custkey"],
    )


def _q_type_inference_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reference typed-column deduction (typed_column_data.cpp:24-81) over
    # string-cast orders columns plus crafted double / mixed / null-bearing
    # columns — one exploded aggregation, regex classes identical in DuckDB
    from desbordante_spark.operators.schema_infer import type_profile

    o = _read(spark, sf_dir, "orders").selectExpr(
        "cast(o_orderkey as string) as ok",
        "cast(o_orderdate as string) as od",
        "o_orderstatus as st",
        "concat(cast(o_orderkey % 1000 as string), '.',"
        " cast(o_custkey % 100 as string)) as dbl",
        "case when o_orderkey % 2 = 0 then cast(o_custkey as string)"
        " else o_orderstatus end as mix",
        "case when o_orderkey % 3 = 0 then 'NULL'"
        " when o_orderkey % 3 = 1 then ''"
        " else cast(o_custkey as string) end as nully",
    )
    return type_profile(o).withColumnRenamed("column", "col_name")


def _q_stats_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.operators.stats import profile

    p = profile(
        _read(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_linenumber", "l_returnflag"],
        # only the projected stats are aggregated: the explode reshape hides
        # unused aggregates (percentile sketches, skewness, word stats) from
        # Catalyst's pruning, so without this they'd be computed and thrown
        # away on every row. Output is unchanged.
        stats=["count_values", "null_count", "distinct_values", "min_value",
               "max_value", "num_zeros", "num_negatives", "avg"],
    )
    return p.select(
        F.col("column").alias("col_name"),
        "count_values",
        "null_count",
        "distinct_values",
        "min_value",
        "max_value",
        "num_zeros",
        "num_negatives",
        F.round("avg", 6).alias("avg_rounded"),
    )


def _q_stats_profile_lineitem_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the 100-TB path: HLL++ distinct + percentile sketches instead of exact
    # distincts. HLL estimates aren't cross-engine comparable, so the oracle
    # checks the deterministic stats while the plan still computes the
    # sketches (has_distinct/n_quantiles force them, Catalyst can't prune)
    from pyspark.sql import functions as F

    from desbordante_spark.operators.stats import profile
    from desbordante_spark.sources.readers import spread_small_input

    # sketch building (HLL, percentile_approx) is heavy per row and fully
    # mergeable — round-robin spread moves the 3 projected columns once and
    # parallelizes the partial sketches (no-op on an already-parallel scan)
    p = profile(
        spread_small_input(
            _read(spark, sf_dir, "lineitem").select(
                "l_quantity", "l_linenumber", "l_extendedprice"
            )
        ),
        ["l_quantity", "l_linenumber", "l_extendedprice"],
        distinct_mode="approx",
        # aggregate only what the output consumes (the HLL and quantile
        # sketches stay — has_distinct/n_quantiles force them); the other
        # ~20 unused aggregates are invisible to Catalyst's pruning behind
        # the explode and would otherwise run on every row
        stats=["count_values", "null_count", "distinct_values", "quantiles",
               "avg"],
    )
    return p.select(
        F.col("column").alias("col_name"),
        "count_values",
        "null_count",
        (F.col("distinct_values") > 0).cast("int").alias("has_distinct"),
        F.size("quantiles").cast("int").alias("n_quantiles"),
        F.round("avg", 6).alias("avg_rounded"),
    )


def _q_word_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.stats import word_stats

    return word_stats(_read(spark, sf_dir, "documents"), "text")


def _q_top_words_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.stats import top_k_words

    return top_k_words(_read(spark, sf_dir, "documents"), "text", k=10)


def _q_drift_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.drift import drift_metrics, histogram_sketch

    sketch = histogram_sketch(
        _read(spark, sf_dir, "events"), "value", "event_type", bucket_width=10.0
    )
    return drift_metrics(sketch, ks_threshold=0.1)


def _q_span_invariant_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # staged interleaved table (F1); reasons flattened to a scalar string so
    # the driver canonicalizer can sort it (array form stays the library API)
    from pyspark.sql import functions as F

    from desbordante_spark.operators.span_invariant import span_wellformed_violations

    docs = _staged_docs(spark)
    return span_wellformed_violations(docs).select(
        "doc_id", F.array_join("reasons", ",").alias("reasons")
    )


def _q_span_equality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # input_hint per-row invariant: span-sequence equality (kind, text,
    # media_ref, order preserved exactly) between two snapshots — here the
    # staged table vs its order-violation-free twin; exactly the reversed-
    # offset docs mismatch
    from desbordante_spark.operators.span_invariant import span_sequence_equality

    a = _staged_docs(spark)
    b = _staged_docs_clean(spark)
    return span_sequence_equality(a, b)


def _q_referential_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    # north-rule referential check: span media_refs → broadcast media catalog
    from pyspark.sql import functions as F

    from desbordante_spark.operators.ind import ind_metrics_df

    docs = _staged_docs(spark)
    # field-first explode → nested pruning: the scan reads only the
    # media_ref subfield, never the span text bulk
    refs = docs.select(
        F.explode(F.col("spans").getField("media_ref")).alias("media_ref")
    )
    catalog = _staged_catalog(spark)
    return ind_metrics_df(refs, ["media_ref"], catalog, ["media_ref"])


def _q_od_violations_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.od import od_violations

    return od_violations(
        _read(spark, sf_dir, "lineitem"), "l_linenumber", "l_quantity",
        context=["l_orderkey"],
    )


def _q_mfd_violations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.operators.mfd import mfd_cluster_diameters

    diam = mfd_cluster_diameters(
        _read(spark, sf_dir, "orders"), ["o_custkey"], ["o_totalprice"]
    )
    return diam.filter(F.col("diameter") > 50000.0).select(
        "o_custkey", "cluster_size", "diameter"
    )


def _q_cfd_metrics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.cfd import cfd_metrics_df

    return cfd_metrics_df(
        _read(spark, sf_dir, "orders"),
        ["o_custkey"],
        ["o_orderpriority"],
        pattern={"o_orderstatus": "F"},
    )


def _q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_read(spark, sf_dir, "documents"), "doc_id", "text")


def _q_minhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.dedup import minhash_signatures

    return minhash_signatures(
        _read(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=8
    )


def _q_simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.dedup import simhash

    return simhash(_read(spark, sf_dir, "documents"), "doc_id", "text")


def _q_near_dup_minhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full MinHash-LSH near-dup pipeline (operators/dedup.py): 2-word
    # shingles → 8 md5 min-hashes → 4 bands → bucket pairs (cap 200) →
    # exact Jaccard ≥ 0.5 — every stage md5-reproducible in the oracle
    from desbordante_spark.operators.dedup import near_duplicates

    return near_duplicates(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        threshold=0.5, num_hashes=8, bands=4, shingle_words=2,
        max_bucket=200,
    )


def _q_token_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.functions.text import regex_token_count, token_count

    return _read(spark, sf_dir, "documents").select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        regex_token_count("text").alias("n_regex_tokens"),
    )


def _q_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.functions.text import doc_fingerprint

    return doc_fingerprint(_read(spark, sf_dir, "documents"), "text", "doc_id")


def _q_lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.functions.text import lang_id_table

    out = lang_id_table(_read(spark, sf_dir, "documents"), "text", "doc_id")
    return out.select(F.col("id").alias("doc_id"), "pred_lang")


def _q_ann_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.operators.similarity import cosine_topk_bruteforce

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    res = cosine_topk_bruteforce(q, emb, "vec_id", "vec_id", k=3)
    return res.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine_r"), "rank"
    )


def _q_ar_pair_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.operators.ar import (
        mine_association_rules,
        transactions_from,
    )

    tx = transactions_from(
        _read(spark, sf_dir, "events"), "singular", "user_id", "event_type"
    )
    rules = mine_association_rules(tx, min_support=0.2, min_confidence=0.6)
    return (
        rules.filter(
            (F.size("antecedent") == 1) & (F.size("consequent") == 1)
        )
        .select(
            F.element_at("antecedent", 1).alias("antecedent"),
            F.element_at("consequent", 1).alias("consequent"),
            F.round("support", 9).alias("support_r"),
            F.round("confidence", 9).alias("confidence_r"),
        )
    )


def _q_ac_exceptions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.ac import ac_exceptions

    exc = ac_exceptions(
        _read(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        "/",
        ranges=[(500.0, 1500.0)],
    )
    return exc.select("l_orderkey", "l_linenumber", "binop_value")


_ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority"]


def _fd_minimal_oracle() -> str:
    """Closed-form SQL for discover_fds(orders, max_lhs=2): all minimal FDs
    with the reference's semantics — X → A reported iff d(X∪A) = d(X), no
    PROPER subset of X is a key or already determines A, and A isn't
    constant (then () → A is the minimal FD). Key LHS themselves DO report
    (README university_fd parity). One wide distinct-count CTE + a UNION of
    condition probes."""
    from itertools import combinations

    cols = sorted(_ORDERS_COLS)

    def d(*cs: str) -> str:
        return "d_" + "__".join(sorted(cs))

    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    sets = (
        [(c,) for c in cols]
        + list(combinations(cols, 2))
        + list(combinations(cols, 3))
    )
    for s in sets:
        tup = s[0] if len(s) == 1 else "(" + ", ".join(s) + ")"
        aggs.append(f"count(DISTINCT {tup}) AS {d(*s)}")
    selects = []
    for a in cols:  # level 0: constant columns → () -> a
        selects.append(f"SELECT '' AS lhs, '{a}' AS rhs FROM m WHERE {d(a)} <= 1")
    for x in cols:  # level 1
        for a in cols:
            if a == x:
                continue
            selects.append(
                f"SELECT '{x}' AS lhs, '{a}' AS rhs FROM m"
                f" WHERE {d(x, a)} = {d(x)} AND {d(a)} > 1"
            )
    for x, y in combinations(cols, 2):  # level 2
        for a in cols:
            if a in (x, y):
                continue
            selects.append(
                f"SELECT '{x},{y}' AS lhs, '{a}' AS rhs FROM m"
                f" WHERE {d(x, y, a)} = {d(x, y)}"
                f" AND {d(x)} < n AND {d(y)} < n"
                f" AND {d(x, a)} <> {d(x)} AND {d(y, a)} <> {d(y)}"
                f" AND {d(a)} > 1"
            )
    return (
        "WITH m AS (SELECT " + ", ".join(aggs) + " FROM orders) "
        + " UNION ALL ".join(selects)
    )


_IND_COLS = [
    ("region", "r_regionkey"),
    ("nation", "n_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_nationkey"),
    ("supplier", "s_nationkey"),
]


def _q_fd_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the library's TANE-style levelwise miner (lattice bookkeeping,
    # minimality + key pruning) — the oracle replicates the same semantics
    # in closed-form SQL up to max_lhs=2
    from desbordante_spark.discovery.tane import discover_fds

    fds = discover_fds(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_lhs=2
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs) for lhs, rhs in fds], "lhs string, rhs string"
    )


_AUCC_COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
_AUCC_MAX_ERR = 0.005


def _q_aucc_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One driver row covering BOTH AUCC miners: levelwise enumeration and
    # the faithful PyroUCC traversal (discovery/aucc.py — pyroucc.cpp's
    # single SearchSpace with KeyG1Strategy). Every classification in the
    # traversal is an exact score, so both emit the identical minimal-AUCC
    # set with identical exact errors. Emits (algorithm, aucc, error).
    from desbordante_spark.discovery.aucc import (
        discover_auccs,
        discover_auccs_pyro,
    )

    df = _read(spark, sf_dir, "orders").select(*_AUCC_COLS)
    rows = [
        (name, ",".join(s), e)
        for name, fn in (
            ("levelwise", discover_auccs),
            ("pyro", discover_auccs_pyro),
        )
        for s, e in fn(df, max_size=2, max_error=_AUCC_MAX_ERR)
    ]
    return spark.createDataFrame(
        rows, "algorithm string, aucc string, error double"
    )


def _q_afd_discovery_sampled_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pyro-style two-phase AFD discovery: estimate on a 50% sample, exact
    # confirm of plausible candidates — same result set as the exact miner,
    # so it shares afd_discovery_orders' oracle
    from desbordante_spark.discovery.pfdtane import discover_afds

    afds = discover_afds(
        _read(spark, sf_dir, "orders").select(*_AFD_COLS),
        max_lhs=2, max_error=0.3, error_measure="per_tuple",
        sample_fraction=0.5,
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs, err) for lhs, rhs, err in afds],
        "lhs string, rhs string, error double",
    )


def _q_afd_discovery_pyro_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pyro-style estimate-driven ascend/descend traversal (discovery/
    # pyro.py): sample estimates steer the walk, every classification is
    # an exact score — IDENTICAL output to the levelwise AFD miner, so it
    # shares afd_discovery_orders' oracle
    from desbordante_spark.discovery.pyro import discover_afds_pyro

    afds = discover_afds_pyro(
        _read(spark, sf_dir, "orders").select(*_AFD_COLS),
        max_lhs=2, max_error=0.3, error_measure="per_tuple",
        sample_fraction=0.1,
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs, err) for lhs, rhs, err in afds],
        "lhs string, rhs string, error double",
    )


def _q_fd_discovery_hybrid_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyFD-style hybrid miner (discovery/hyfd.py): sampled negative cover
    # + batched validation — must produce the SAME minimal-FD set as the
    # levelwise miner, so it shares fd_discovery_orders' oracle
    from desbordante_spark.discovery.hyfd import discover_fds_hybrid

    fds = discover_fds_hybrid(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_lhs=2
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs) for lhs, rhs in fds], "lhs string, rhs string"
    )


def _q_fd_discovery_fdep_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FDep/FastFDs-family miner (discovery/fdep.py): complete agree-set
    # cover via subset pair-counts + Möbius inversion (no pair stream),
    # then driver-side negative-cover inversion — must produce the SAME
    # minimal-FD set as the levelwise miner, so it shares the oracle
    from desbordante_spark.discovery.fdep import discover_fds_fdep

    fds = discover_fds_fdep(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_lhs=2
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs) for lhs, rhs in fds], "lhs string, rhs string"
    )


def _q_fd_discovery_fun_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FUN free-set miner (discovery/fun.py): node-pruned cardinality
    # lattice, Expand-free batched distinct counts — exact, so it shares
    # the minimal-FD oracle
    from desbordante_spark.discovery.fun import discover_fds_fun

    fds = discover_fds_fun(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_lhs=2
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs) for lhs, rhs in fds], "lhs string, rhs string"
    )


def _q_fd_discovery_dfd_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DFD random-walk miner (discovery/dfd.py): lockstep walks, one batched
    # cardinality job per round, subset/superset inference — exact, so it
    # shares the minimal-FD oracle
    from desbordante_spark.discovery.dfd import discover_fds_dfd

    fds = discover_fds_dfd(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_lhs=2
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs) for lhs, rhs in fds], "lhs string, rhs string"
    )


def _q_fd_discovery_fastfds_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FastFDs miner (discovery/fastfds.py): difference-set minimal-cover
    # DFS (coverage-ordered branching, minimality-checked leaves) over the
    # distributed agree-set factory — exact, so it shares the minimal-FD
    # oracle
    from desbordante_spark.discovery.fastfds import discover_fds_fastfds

    fds = discover_fds_fastfds(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_lhs=2
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs) for lhs, rhs in fds], "lhs string, rhs string"
    )


def _q_fd_discovery_depminer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Depminer miner (discovery/depminer.py): maximal agree sets → CMAX
    # complements → levelwise hitting-set candidates over the distributed
    # agree-set factory — exact, so it shares the minimal-FD oracle
    from desbordante_spark.discovery.depminer import discover_fds_depminer

    fds = discover_fds_depminer(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_lhs=2
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs) for lhs, rhs in fds], "lhs string, rhs string"
    )


def _q_fd_discovery_fdmine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FD_Mine miner (discovery/fd_mine.py): levelwise closures +
    # equivalence pruning + eq-substitution reconstruction. Its raw output
    # is non-minimized by design; the reference's own conformance test
    # (src/tests/test_fd_mine.cpp:139-186) minimizes + constant-substitutes
    # before comparing with Pyro — the `minimized` entry point applies
    # exactly that post-processing, after which the result must equal the
    # levelwise miner's, so it shares the minimal-FD oracle (filtered to
    # max_lhs=2 for comparability)
    from desbordante_spark.discovery.fd_mine import (
        discover_fds_fdmine_minimized,
    )

    fds = discover_fds_fdmine_minimized(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_lhs=2
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs) for lhs, rhs in fds], "lhs string, rhs string"
    )


_AFD_COLS = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]
_OD_COLS = ["l_linenumber", "l_quantity", "l_extendedprice"]


def _q_afd_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PFDTane-style levelwise AFD miner (per_tuple error, one batched job
    # per level)
    from desbordante_spark.discovery.pfdtane import discover_afds

    afds = discover_afds(
        _read(spark, sf_dir, "orders").select(*_AFD_COLS),
        max_lhs=2, max_error=0.3, error_measure="per_tuple",
    )
    return spark.createDataFrame(
        [(",".join(lhs), rhs, err) for lhs, rhs, err in afds],
        "lhs string, rhs string, error double",
    )


def _q_od_discovery_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # all ascending A -> B order dependencies among three lineitem measures
    # per order (one batched job for every candidate)
    from desbordante_spark.discovery.order import discover_ods

    return discover_ods(
        _read(spark, sf_dir, "lineitem"),
        columns=_OD_COLS,
        context=["l_orderkey"],
        directions=("asc",),
    )


def _q_ucc_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyUCC-equivalent levelwise miner (discovery/tane.py) — all minimal
    # unique column combinations up to 2 columns
    from desbordante_spark.discovery.tane import discover_uccs

    uccs = discover_uccs(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_size=2
    )
    return spark.createDataFrame([(",".join(u),) for u in uccs], "ucc string")


def _q_ucc_discovery_hybrid_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyUCC-style hybrid miner (discovery/hyucc.py): sampled negative cover
    # refutes UCC candidates, batched validation exactly confirms the
    # survivors — the reference pins HyUCC to the verifier's result set
    # (test_ucc_verifier.cpp:96-123), so it shares ucc_discovery_orders'
    # oracle
    from desbordante_spark.discovery.hyucc import discover_uccs_hybrid

    uccs = discover_uccs_hybrid(
        _read(spark, sf_dir, "orders").select(*_ORDERS_COLS), max_size=2
    )
    return spark.createDataFrame([(",".join(u),) for u in uccs], "ucc string")


def _q_ind_discovery_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.discovery.spider import discover_unary_inds

    tables = {t: _read(spark, sf_dir, t) for t in
              {"region", "nation", "customer", "supplier"}}
    cols: dict[str, list[str]] = {}
    for t, c in _IND_COLS:
        cols.setdefault(t, []).append(c)
    return discover_unary_inds(tables, cols, max_error=0.0)


def _q_pfd_metrics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.fd import pfd_metrics_df

    return pfd_metrics_df(
        _read(spark, sf_dir, "orders"), ["o_custkey"], ["o_orderpriority"],
        error_measure="per_tuple", error_threshold=0.3,
    )


def _q_dd_violations_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.dd import dd_violations

    return dd_violations(
        _read(spark, sf_dir, "supplier"),
        {"s_acctbal": (0.0, 100.0)},
        "s_nationkey", 0.0, 5.0,
        row_id="s_suppkey",
    )


def _q_ann_topk_lsh_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hyperplane-LSH ANN — planes are md5-derived literal arrays
    # (similarity.plane_components), so the DuckDB oracle reproduces the
    # exact same buckets
    from pyspark.sql import functions as F

    from desbordante_spark.operators.similarity import cosine_topk_lsh

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    res = cosine_topk_lsh(q, emb, "vec_id", "vec_id", k=3, planes=6, dim=64)
    return res.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine_r"), "rank"
    )


def _q_ann_topk_ivf_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF-flat ANN: deterministic md5-sampled coarse quantizer, nprobe
    # nearest inverted lists, exact re-scoring
    from pyspark.sql import functions as F

    from desbordante_spark.operators.similarity import cosine_topk_ivf

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    res = cosine_topk_ivf(q, emb, "vec_id", "vec_id", k=3,
                          n_centroids=16, nprobe=4)
    return res.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine_r"), "rank"
    )


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.operators.similarity import embedding_near_dup_pairs

    # testdata embeddings have max pairwise cosine ~0.4 — use a threshold
    # that yields a non-trivial result set
    res = embedding_near_dup_pairs(
        _read(spark, sf_dir, "embeddings"), "vec_id", threshold=0.3, planes=4,
        dim=64,
    )
    return res.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine_r")
    )


def _q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.dedup import simhash, simhash_near_pairs

    fps = simhash(_read(spark, sf_dir, "documents"), "doc_id", "text")
    # partial_ok: candidate generation is chunk-blocked (recall complete only
    # to hamming ≤ 3); the oracle applies the same blocking — documented
    # contract, not an accidental gap
    return simhash_near_pairs(fps, max_hamming=10, partial_ok=True)


def _q_ind_discovery_nary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mind levelwise n-ary discovery: a deterministic projection of orders
    # (o_orderkey % 7 = 0) is included by construction in orders, giving a
    # true arity-2 IND the miner must find (plus its unary projections)
    from pyspark.sql import functions as F

    from desbordante_spark.discovery.mind import discover_nary_inds

    orders = _read(spark, sf_dir, "orders")
    sample = orders.filter(F.col("o_orderkey") % 7 == 0)
    cols = ["o_custkey", "o_orderpriority"]
    return discover_nary_inds(
        {"orders_sample": sample, "orders": orders},
        {"orders_sample": cols, "orders": cols},
        max_arity=2,
    )


def _q_cfd_tableau_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.operators.cfd import cfd_tableau_metrics_df

    out = cfd_tableau_metrics_df(
        _read(spark, sf_dir, "orders"),
        ["o_custkey"],
        ["o_orderpriority"],
        tableau=[
            {"o_orderstatus": "F"},
            {"o_orderstatus": "O"},
            {"o_orderstatus": "P"},
        ],
        error_threshold=0.001,
        min_support=100,
    )
    return out.select(
        "pattern_id", "pattern", "support", "num_violating_clusters",
        "num_violating_rows", "error", "confidence", "holds",
    )


def _q_od_violations_lineitem_2col(spark: SparkSession, sf_dir: str) -> DataFrame:
    # list-based OD (order/order.h:17-47): 2-column LHS list, lexicographic
    from desbordante_spark.operators.od import od_violations

    return od_violations(
        _read(spark, sf_dir, "lineitem"),
        ["l_linenumber", "l_quantity"],
        "l_extendedprice",
        context=["l_orderkey"],
    )


def _q_dynamic_fd_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # incremental (batch-CRUD) FD verify: init on a base slice, apply an
    # insert batch + a delete batch, read the verdict from the state — must
    # equal the batch verdict over the equivalent final set (the oracle
    # computes that set directly in SQL)
    from pyspark.sql import functions as F

    from desbordante_spark.operators.dynamic import (
        fd_metrics_from_state,
        fd_state_init,
        state_apply,
    )

    orders = _read(spark, sf_dir, "orders")
    okey = F.col("o_orderkey")
    base = orders.filter(okey % 3 != 0)
    inserts = orders.filter((okey % 3 == 0) & (okey % 2 == 0))
    deletes = base.filter(okey % 5 == 0)
    lhs, rhs = ["o_custkey"], ["o_orderpriority"]
    st = fd_state_init(base, lhs, rhs)
    st = state_apply(st, [*lhs, *rhs], inserts=inserts, deletes=deletes)
    return fd_metrics_from_state(st, lhs)


def _q_dynamic_fd_incremental_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # round-6 snapshot-delta path: the SAME CRUD scenario as
    # dynamic_fd_orders, but the verdict comes from fd_apply_incremental —
    # touched-LHS-only re-aggregation with carried totals
    # (operators/dynamic.py) — so it shares dynamic_fd_orders' oracle
    from pyspark.sql import functions as F

    from desbordante_spark.operators.dynamic import (
        fd_apply_incremental,
        fd_state_init,
        fd_totals_from_state,
        metrics_row_from_totals,
    )

    orders = _read(spark, sf_dir, "orders")
    okey = F.col("o_orderkey")
    base = orders.filter(okey % 3 != 0)
    inserts = orders.filter((okey % 3 == 0) & (okey % 2 == 0))
    deletes = base.filter(okey % 5 == 0)
    lhs, rhs = ["o_custkey"], ["o_orderpriority"]
    st = fd_state_init(base, lhs, rhs).localCheckpoint(eager=True)
    totals = fd_totals_from_state(st, lhs)
    _st, totals = fd_apply_incremental(
        st, lhs, rhs, totals, inserts=inserts, deletes=deletes
    )
    m = metrics_row_from_totals(totals)
    return spark.createDataFrame(
        [(m["total_rows"], m["num_violating_clusters"],
          m["num_violating_rows"], m["error"], m["holds"])],
        "total_rows bigint, num_violating_clusters bigint,"
        " num_violating_rows bigint, error double, holds int",
    )


def _q_profile_incremental_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable per-partition profile state (operators/profile_state):
    a deterministic base/delta split of `documents` runs the snapshot
    chain — init(base) then apply_incremental(delta), touching only the
    delta's partitions — and the rollup must equal a full-table profile.
    The oracle computes that full-table profile in plain SQL; only the
    EXACT fields are compared (the HLL distinct estimate is
    engine-specific and is gated in tests/test_profile_state.py)."""
    from pyspark.sql import functions as F

    from desbordante_spark.operators.profile_state import (
        profile_apply_incremental,
        profile_from_state,
        profile_state_init,
    )

    h = F.md5(F.col("doc_id").cast("string"))
    docs = _read(spark, sf_dir, "documents").withColumn(
        "part_key", F.substring(h, 1, 1)
    )
    split = F.substring(h, 2, 1)
    base = docs.filter(split < "8")
    delta = docs.filter(split >= "8")
    cols = ["lang", "source", "n_chars"]
    st = profile_state_init(base, columns=cols)
    st = profile_apply_incremental(st, delta, columns=cols)
    p = profile_from_state(st)
    return p.select(
        F.col("column").alias("col_name"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("null_count").cast("long").alias("null_count"),
        F.col("empty_count").cast("long").alias("empty_count"),
        F.col("count_values").cast("long").alias("count_values"),
        # n_chars is integer-valued: the double-summed state casts back
        # losslessly below 2^53
        F.col("min_num").cast("long").alias("min_num"),
        F.col("max_num").cast("long").alias("max_num"),
        F.col("sum_num").cast("long").alias("sum_num"),
        "min_str",
        "max_str",
    )


def _q_profile_lineage_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The per-partition LINEAGE view of the incrementally maintained
    profile state (north rule: checkpoints carry per-partition lineage +
    metrics rows): same snapshot chain as profile_incremental_documents,
    rolled up with per_partition=True — every exact field must equal a
    plain per-partition SQL profile of the full table."""
    from pyspark.sql import functions as F

    from desbordante_spark.operators.profile_state import (
        profile_apply_incremental,
        profile_from_state,
        profile_state_init,
    )

    h = F.md5(F.col("doc_id").cast("string"))
    docs = _read(spark, sf_dir, "documents").withColumn(
        "part_key", F.substring(h, 1, 1)
    )
    split = F.substring(h, 2, 1)
    cols = ["lang", "n_chars"]
    st = profile_state_init(docs.filter(split < "8"), columns=cols)
    st = profile_apply_incremental(
        st, docs.filter(split >= "8"), columns=cols
    )
    p = profile_from_state(st, per_partition=True)
    return p.select(
        "partition",
        F.col("column").alias("col_name"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("null_count").cast("long").alias("null_count"),
        F.col("count_values").cast("long").alias("count_values"),
        F.col("min_num").cast("long").alias("min_num"),
        F.col("max_num").cast("long").alias("max_num"),
        F.col("sum_num").cast("long").alias("sum_num"),
        "min_str",
        "max_str",
    )


def _q_drift_incremental_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift-from-state (operators/profile_state): a histogram state built
    on a base slice of `events` and advanced with a delta slice — the
    delta deliberately touches ONLY the 'click' partition, so every other
    event_type's state rows ride the anti-join pass-through — must yield
    the SAME KS/chi² verdicts as a full-table drift run. The oracle is the
    full-table drift SQL (histogram counts are exact, so incremental ≡
    full bit-for-bit)."""
    from pyspark.sql import functions as F

    from desbordante_spark.operators.profile_state import (
        drift_from_state,
        hist_apply_incremental,
        hist_state_init,
    )

    ev = _read(spark, sf_dir, "events")
    split = F.md5(F.coalesce(F.col("event_id").cast("string"), F.lit("x")))
    is_delta = (F.substring(split, 1, 1) >= "c") & (
        F.coalesce(F.col("event_type"), F.lit("")) == "click"
    )
    specs = {"value": 10.0}
    st = hist_state_init(ev.filter(~is_delta), specs, by="event_type")
    st = hist_apply_incremental(
        st, ev.filter(is_delta), specs, by="event_type"
    )
    return drift_from_state(st, "value", ks_threshold=0.1)


def _q_quality_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from desbordante_spark.functions.text import quality_score

    q = quality_score(_read(spark, sf_dir, "documents"), "text", "doc_id")
    return q.select(
        F.col("id").alias("doc_id"),
        "n_chars",
        "n_tokens",
        F.round("mean_word_len", 6).alias("mean_word_len_r"),
        "quality",
    )


def _q_gfd_order_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GFD over the orders–customer bipartite graph: pattern
    # (order)-[placed_by]-(customer); premise o.status='F' ⇒ conclusion
    # c.mktsegment='BUILDING' (false — yields a real violation count)
    from pyspark.sql import functions as F

    from desbordante_spark.operators.gfd import gfd_metrics_df

    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    vertices = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("vertex_id"),
        F.lit("customer").alias("label"),
        F.col("c_mktsegment"),
        F.lit(None).cast("string").alias("o_orderstatus"),
    ).unionByName(
        orders.select(
            F.concat(F.lit("o"), F.col("o_orderkey")).alias("vertex_id"),
            F.lit("order").alias("label"),
            F.lit(None).cast("string").alias("c_mktsegment"),
            F.col("o_orderstatus"),
        )
    )
    edges = orders.select(
        F.concat(F.lit("o"), F.col("o_orderkey")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        F.lit("placed_by").alias("label"),
    )
    return gfd_metrics_df(
        vertices, edges,
        {"o": "order", "c": "customer"},
        [("o", "c", "placed_by")],
        premises=[(("o", "o_orderstatus"), "F")],
        conclusion=[(("c", "c_mktsegment"), "BUILDING")],
    )


def _q_mfd_highlights_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from desbordante_spark.operators.mfd import mfd_highlights

    return mfd_highlights(
        _read(spark, sf_dir, "orders"), ["o_custkey"], ["o_totalprice"],
        parameter=50000.0,
    )


_CFD_COLS = ["o_orderstatus", "o_orderpriority", "o_year"]
_CFD_MINSUP = 100
_CFD_MINCONF = 0.8


def _q_cfd_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FDFirst-style CFD mining (discovery/cfd_miner.py): every qualifying
    # constant/variable itemset rule over three orders attributes (o_year
    # derived as the first 4 chars of the date — early years are all-F
    # status, giving real constant rules)
    from pyspark.sql import functions as F

    from desbordante_spark.discovery.cfd_miner import discover_cfds

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority",
        F.col("o_orderdate").cast("string").substr(1, 4).alias("o_year"),
    )
    return discover_cfds(
        orders,
        _CFD_COLS,
        min_support=_CFD_MINSUP,
        min_confidence=_CFD_MINCONF,
        max_lhs=2,
    )


def _q_od_discovery_auto_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fastod automatic context-lattice search: charge = price*(1+tax) is
    # ordered by price only WITHIN a fixed tax rate, so the miner must find
    # the minimal context {l_tax} and prune its supersets
    from pyspark.sql import functions as F

    from desbordante_spark.discovery.order import discover_ods_auto

    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_tax", "l_extendedprice",
        (F.col("l_extendedprice") * (F.lit(1.0) + F.col("l_tax")))
        .alias("charge"),
    )
    return discover_ods_auto(
        li, ["charge", "l_extendedprice"], ["l_returnflag", "l_tax"],
        max_context=2, directions=("asc",),
    )


def _q_dd_discovery_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Split-style DD mining: tightest RHS difference bounds over the pairs
    # qualifying under |Δs_acctbal| <= 100 (same LHS as dd_violations)
    from desbordante_spark.discovery.split import discover_dds

    return discover_dds(
        _read(spark, sf_dir, "supplier"),
        {"s_acctbal": (0.0, 100.0)},
        ["s_nationkey", "s_name"],
        "s_suppkey",
    )


def _q_ind_discovery_nary_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Faida two-phase: HLL sketch prune per level, exact confirmation of
    # survivors — result set identical to exact Mind (same oracle)
    from pyspark.sql import functions as F

    from desbordante_spark.discovery.mind import discover_nary_inds

    orders = _read(spark, sf_dir, "orders")
    sample = orders.filter(F.col("o_orderkey") % 7 == 0)
    cols = ["o_custkey", "o_orderpriority"]
    return discover_nary_inds(
        {"orders_sample": sample, "orders": orders},
        {"orders_sample": cols, "orders": cols},
        max_arity=2,
        approx=True,
    )


# directors graph, transplanted from the reference fixture
# test_input_data/graph_data/directors.dot (public test data)
_DIRECTORS_DOT = """graph G {
0[label="person" name="James Cameron" celebrity="high"];
1[label="film" name="Avatar" success="high" year="2009"];
2[label="film" name="Titanic" success="high" year="1997"];
3[label="film" name="Piranha II" success="low" year="1981"];
4[label="film" name="Terminator" success="high" year="1984"];
5[label="person" name="Robert Zemeckis" celebrity="high"];
6[label="film" name="The Walk" success="high" year="2015"];
7[label="film" name="Back to the future" success="high" year="1985"];
8[label="film" name="Forrest Gump" success="high" year="1994"];
9[label="person" name="James Toback" celebrity="low"];
10[label="film" name="Tyson" success="high" year="2008"];
11[label="film" name="Fingers" success="high" year="1978"];
0--1 [label="directed"];
0--2 [label="directed"];
0--3 [label="directed"];
0--4 [label="directed"];
5--6 [label="directed"];
5--7 [label="directed"];
5--8 [label="directed"];
9--10 [label="directed"];
9--11 [label="directed"];
}"""

_DIRECTORS_GFD = """0.celebrity=high
1.success=high
graph G {
0[label=person];
1[label=film];
0--1 [label=directed];
}"""

_TYPOS_PATH = f"{_STAGE_ROOT}/typos_cities"


def _staged_typos(spark: SparkSession) -> DataFrame:
    """Deterministic (city, country) table with injected near-miss typos:
    per city a dominant country spelling plus minority variants at edit
    distance 1-2 (typos), one variant beyond radius, and one cluster whose
    majority is under the ratio threshold (excluded by the pipeline)."""
    import os

    if not os.path.exists(f"{_TYPOS_PATH}/_SUCCESS"):
        rows = []
        spec = [
            # city, majority, [(variant, count), ...], majority_count
            ("berlin", "Germany", [("Germny", 3), ("Gernany", 2)], 40),
            ("paris", "France", [("Frnace", 4), ("Franse", 1)], 35),
            ("tokyo", "Japan", [("Japam", 2), ("Sweden", 3)], 30),
            ("lyon", "France", [], 20),
            # no clear majority: 10 vs 9 of 19 rows -> proportion < 0.6
            ("split", "Croatia", [("Croatia2", 9)], 10),
        ]
        for city, major, variants, mcount in spec:
            rows += [(city, major)] * mcount
            for val, cnt in variants:
                rows += [(city, val)] * cnt
        spark.createDataFrame(
            rows, "city string, country string"
        ).coalesce(1).write.mode("overwrite").parquet(_TYPOS_PATH)
    return spark.read.parquet(_TYPOS_PATH)


def _q_typo_candidates_cities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TypoMiner pipeline (pipelines/typo_miner.py): FD city->country holds
    # approximately; minority spellings within 2 edits of the cluster
    # majority (holding >= 60% of rows) are typo candidates
    from desbordante_spark.pipelines.typo_miner import find_typo_candidates

    return find_typo_candidates(
        _staged_typos(spark), ["city"], "country", radius=2, ratio=0.6
    )


_DIRECTORS_V_PATH = f"{_STAGE_ROOT}/directors_v"
_DIRECTORS_E_PATH = f"{_STAGE_ROOT}/directors_e"


def _staged_directors(spark: SparkSession):
    import os

    from desbordante_spark.sources.graph_dot import dot_graph_frames

    if not (
        os.path.exists(f"{_DIRECTORS_V_PATH}/_SUCCESS")
        and os.path.exists(f"{_DIRECTORS_E_PATH}/_SUCCESS")
    ):
        v, e = dot_graph_frames(spark, _DIRECTORS_DOT)
        v.write.mode("overwrite").parquet(_DIRECTORS_V_PATH)
        e.write.mode("overwrite").parquet(_DIRECTORS_E_PATH)
    return (
        spark.read.parquet(_DIRECTORS_V_PATH),
        spark.read.parquet(_DIRECTORS_E_PATH),
    )


def _q_gfd_dot_directors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # file-based GFD flow: .dot text -> vertex/edge frames (staged so the
    # DuckDB oracle reads the same parquet) -> join-based verdict
    from desbordante_spark.operators.gfd import gfd_metrics_df
    from desbordante_spark.sources.graph_dot import parse_gfd_file

    vertices, edges = _staged_directors(spark)
    spec = parse_gfd_file(_DIRECTORS_GFD)
    return gfd_metrics_df(
        vertices, edges,
        spec["pattern_vertices"], spec["pattern_edges"],
        spec["premises"], spec["conclusion"],
    )


_MIXEDFMT_PATH = f"{_STAGE_ROOT}/mixedfmt"


def _staged_mixedfmt(spark: SparkSession) -> DataFrame:
    """Deterministic typed-encoding fixture: a Double column in three text
    forms ('1'/'1.0'/'01' must share one rank), a BigInt column (raw-text
    lexicographic order, BigIntType : StringType), a string column with
    null/empty/'NULL' tokens, and a delimited-date column in all three
    reference delimiters (-, /, .)."""
    import os

    if not os.path.exists(f"{_MIXEDFMT_PATH}/_SUCCESS"):
        rows = [
            (0, "1", "99", "b", "2020-01-02"),
            (1, "1.0", "12345678901234567890", "a", "2020/01/03"),
            (2, "01", "123456789012345678901", "NULL", "2020.02.29"),
            (3, "2", "99", "", "2021-12-31"),
            (4, "+3", "100000000000000000000", "c", "2020-01-02"),
            (5, "NULL", "NULL", "zz", "NULL"),
            (6, "2.50", "", "a", "2021-01-01"),
            (7, "0.5", "98", "B", "2020-01-02"),
        ]
        spark.createDataFrame(
            rows, "rid int, num string, big string, s string, d string"
        ).coalesce(1).write.mode("overwrite").parquet(_MIXEDFMT_PATH)
    return spark.read.parquet(_MIXEDFMT_PATH)


def _q_typed_rank_mixedfmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the reference's typed-comparator rank encoding
    # (storage/data_frame.cpp:125-171 via discovery/fastod_encode):
    # numeric text forms rank by parsed value, bigints by raw text,
    # dates chronologically, null/empty/'NULL' share the lowest rank
    from desbordante_spark.discovery.fastod_encode import typed_rank_encode

    return typed_rank_encode(
        _staged_mixedfmt(spark), ["num", "big", "s", "d"]
    ).select("rid", "num", "big", "s", "d")


_AINDNULLS_PATH = f"{_STAGE_ROOT}/aindnulls"


def _staged_aindnulls(spark: SparkSession) -> DataFrame:
    import os

    if not os.path.exists(f"{_AINDNULLS_PATH}/_SUCCESS"):
        rows = [
            ("1", "1", "1"),
            ("2", "2", "9"),
            ("3", "3", "9"),
            ("NULL", "4", "2"),
            ("NULL", "5", "NULL"),
        ]
        spark.createDataFrame(
            rows, "a string, b string, c string"
        ).coalesce(1).write.mode("overwrite").parquet(_AINDNULLS_PATH)
    return spark.read.parquet(_AINDNULLS_PATH)


def _q_ind_discovery_aind_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spider AIND under the reference's singleton-null-cluster semantics
    # (spider.cpp:80,115-121 with equal_nulls=False, max_error>0): each
    # null row is one unmatched cluster in the error denominator
    from desbordante_spark.discovery.spider import discover_unary_inds

    return discover_unary_inds(
        {"aind": _staged_aindnulls(spark)},
        max_error=0.5,
        null_value="NULL",
        equal_nulls=False,
    )


_FD_MINER_NAMES = (
    "tane", "hyfd", "fdep", "fun", "dfd", "fastfds", "depminer", "fdmine",
)


def _q_fd_discovery_all_miners_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # One driver row covering ALL eight FD miners: the reference pins every
    # FD algorithm to the SAME canonical result hash per dataset
    # (src/tests/test_fd_algorithm.cpp:105-110), so each miner must emit the
    # identical minimal-FD set. Emits (algorithm, lhs, rhs); the oracle is
    # the closed-form minimal-FD set cross-joined with the algorithm names.
    from desbordante_spark.discovery.depminer import discover_fds_depminer
    from desbordante_spark.discovery.dfd import discover_fds_dfd
    from desbordante_spark.discovery.fastfds import discover_fds_fastfds
    from desbordante_spark.discovery.fd_mine import (
        discover_fds_fdmine_minimized,
    )
    from desbordante_spark.discovery.fdep import discover_fds_fdep
    from desbordante_spark.discovery.fun import discover_fds_fun
    from desbordante_spark.discovery.hyfd import discover_fds_hybrid
    from desbordante_spark.discovery.tane import discover_fds

    miners = {
        "tane": discover_fds,
        "hyfd": discover_fds_hybrid,
        "fdep": discover_fds_fdep,
        "fun": discover_fds_fun,
        "dfd": discover_fds_dfd,
        "fastfds": discover_fds_fastfds,
        "depminer": discover_fds_depminer,
        "fdmine": discover_fds_fdmine_minimized,
    }
    df = _read(spark, sf_dir, "orders").select(*_ORDERS_COLS)
    rows = [
        (name, ",".join(lhs), rhs)
        for name in _FD_MINER_NAMES
        for lhs, rhs in miners[name](df, max_lhs=2)
    ]
    return spark.createDataFrame(
        rows, "algorithm string, lhs string, rhs string"
    )


def _q_ucc_discovery_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One driver row covering both UCC miners (levelwise TANE-style +
    # hybrid HyUCC) — the reference pins HyUCC to the verifier's result set
    # (test_ucc_verifier.cpp:96-123), so both emit the identical minimal
    # UCC set. Emits (algorithm, ucc).
    from desbordante_spark.discovery.hyucc import discover_uccs_hybrid
    from desbordante_spark.discovery.tane import discover_uccs

    df = _read(spark, sf_dir, "orders").select(*_ORDERS_COLS)
    rows = [
        (name, ",".join(u))
        for name, fn in (
            ("tane", discover_uccs),
            ("hyucc", discover_uccs_hybrid),
        )
        for u in fn(df, max_size=2)
    ]
    return spark.createDataFrame(rows, "algorithm string, ucc string")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver records exactly the FIRST 50 entries in
    # CORRECTNESS_r{N}.json. Slots 1-50 therefore hold exactly one entry per
    # SURVEY §2 operator family / LLM-pipeline operator (redundant
    # same-result variants are collapsed into the *_all_* combined entries).
    # Entries past 50 are same-family variants kept for check_oracle/pytest
    # granularity — still oracle-gated, just not driver-recorded.
    return {
        # — verification primitives (one per §2.3 family) —
        "ucc_violations_orders_custkey": _q_ucc_violations_orders_custkey,
        "fd_violations_orders": _q_fd_violations_orders,
        "afd_metrics_lineitem": _q_afd_metrics_lineitem,
        "pfd_metrics_orders": _q_pfd_metrics_orders,
        "ind_metrics_lineitem_orders": _q_ind_metrics_lineitem_orders,
        "referential_media_catalog": _q_referential_media_catalog,
        "od_violations_lineitem": _q_od_violations_lineitem,
        "mfd_violations_orders": _q_mfd_violations_orders,
        "cfd_metrics_orders": _q_cfd_metrics_orders,
        "dd_violations_supplier": _q_dd_violations_supplier,
        "gfd_order_customer": _q_gfd_order_customer,
        "gfd_dot_directors": _q_gfd_dot_directors,
        "dynamic_fd_orders": _q_dynamic_fd_orders,
        "dynamic_fd_incremental_orders": _q_dynamic_fd_incremental_orders,
        "span_invariant_violations": _q_span_invariant_violations,
        "span_equality_docs": _q_span_equality_docs,
        # — statistics / profiling (§2.4) —
        "stats_profile_lineitem": _q_stats_profile_lineitem,
        "profile_incremental_documents": _q_profile_incremental_documents,
        "type_inference_orders": _q_type_inference_orders,
        "word_stats_documents": _q_word_stats_documents,
        "drift_events_by_type": _q_drift_events_by_type,
        # — LLM-pipeline operators (one per operator) —
        "dedup_exact_documents": _q_dedup_exact_documents,
        "minhash_documents": _q_minhash_documents,
        "near_dup_minhash_documents": _q_near_dup_minhash_documents,
        "simhash_near_pairs": _q_simhash_near_pairs,
        "token_counts_documents": _q_token_counts_documents,
        "fingerprint_documents": _q_fingerprint_documents,
        "lang_id_documents": _q_lang_id_documents,
        "quality_score_documents": _q_quality_score_documents,
        "ann_topk_embeddings": _q_ann_topk_embeddings,
        "ann_topk_lsh_embeddings": _q_ann_topk_lsh_embeddings,
        "ann_topk_ivf_embeddings": _q_ann_topk_ivf_embeddings,
        "embedding_near_dup": _q_embedding_near_dup,
        # — discovery miners (§2.5, one per algorithm family) —
        "fd_discovery_all_miners_orders": _q_fd_discovery_all_miners_orders,
        "afd_discovery_orders": _q_afd_discovery_orders,
        "afd_discovery_pyro_orders": _q_afd_discovery_pyro_orders,
        "aucc_discovery_orders": _q_aucc_discovery_orders,
        "ucc_discovery_all_orders": _q_ucc_discovery_all_orders,
        "od_discovery_lineitem": _q_od_discovery_lineitem,
        "od_discovery_auto_lineitem": _q_od_discovery_auto_lineitem,
        "ind_discovery_tpch": _q_ind_discovery_tpch,
        "ind_discovery_nary": _q_ind_discovery_nary,
        "ind_discovery_nary_approx": _q_ind_discovery_nary_approx,
        "ind_discovery_aind_nulls": _q_ind_discovery_aind_nulls,
        "cfd_discovery_orders": _q_cfd_discovery_orders,
        "dd_discovery_supplier": _q_dd_discovery_supplier,
        "ar_pair_rules_events": _q_ar_pair_rules_events,
        "ac_exceptions_lineitem": _q_ac_exceptions_lineitem,
        "typo_candidates_cities": _q_typo_candidates_cities,
        "typed_rank_mixedfmt": _q_typed_rank_mixedfmt,
        # ---- position 51+ : same-family variants (check_oracle/pytest) ----
        # fd_metrics_orders demoted round 6 (same FD-verify family as
        # fd_violations_orders) to make room for the mergeable-profile gate
        "fd_metrics_orders": _q_fd_metrics_orders,
        "ucc_metrics_orders_custkey": _q_ucc_metrics_orders_custkey,
        "ucc_metrics_lineitem_pk": _q_ucc_metrics_lineitem_pk,
        "ind_missing_events_customer": _q_ind_missing_events_customer,
        "stats_profile_lineitem_approx": _q_stats_profile_lineitem_approx,
        "drift_incremental_events": _q_drift_incremental_events,
        "profile_lineage_documents": _q_profile_lineage_documents,
        "top_words_documents": _q_top_words_documents,
        "od_violations_lineitem_2col": _q_od_violations_lineitem_2col,
        "mfd_highlights_orders": _q_mfd_highlights_orders,
        "cfd_tableau_orders": _q_cfd_tableau_orders,
        "simhash_documents": _q_simhash_documents,
        "fd_discovery_orders": _q_fd_discovery_orders,
        "fd_discovery_hybrid_orders": _q_fd_discovery_hybrid_orders,
        "fd_discovery_fdep_orders": _q_fd_discovery_fdep_orders,
        "fd_discovery_fun_orders": _q_fd_discovery_fun_orders,
        "fd_discovery_dfd_orders": _q_fd_discovery_dfd_orders,
        "fd_discovery_fastfds_orders": _q_fd_discovery_fastfds_orders,
        "fd_discovery_depminer_orders": _q_fd_discovery_depminer_orders,
        "fd_discovery_fdmine_orders": _q_fd_discovery_fdmine_orders,
        "ucc_discovery_orders": _q_ucc_discovery_orders,
        "ucc_discovery_hybrid_orders": _q_ucc_discovery_hybrid_orders,
        "afd_discovery_sampled_orders": _q_afd_discovery_sampled_orders,
    }


# ------------------------------------------------------------- oracle SQL

_UCC_METRICS_SQL = """
WITH g AS (SELECT {cols}, count(*) AS cnt FROM {table} GROUP BY {cols}),
m AS (
  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS total_rows,
         CAST(coalesce(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS num_violating_clusters,
         CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0) AS BIGINT)
           AS num_violating_rows,
         CAST(coalesce(sum(cnt * (cnt - 1)), 0) AS BIGINT) AS pairs2x
  FROM g)
SELECT total_rows, num_violating_clusters, num_violating_rows,
       CASE WHEN total_rows > 1
            THEN CAST(pairs2x AS DOUBLE)
                 / CAST(total_rows * (total_rows - 1) AS DOUBLE)
            ELSE 0.0 END AS error,
       CAST(CASE WHEN num_violating_clusters = 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM m
"""

_FD_METRICS_SQL = """
WITH l1 AS (SELECT {lhs}, {rhs}, count(*) AS cnt
            FROM {table} GROUP BY {lhs}, {rhs}),
l2 AS (SELECT {lhs},
              CAST(sum(cnt) AS BIGINT) AS cluster_size,
              CAST(count(*) AS BIGINT) AS num_distinct_rhs,
              CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS eq_pairs2x
       FROM l1 GROUP BY {lhs}),
m AS (
  SELECT CAST(coalesce(sum(cluster_size), 0) AS BIGINT) AS total_rows,
         CAST(coalesce(sum(CASE WHEN num_distinct_rhs > 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS num_violating_clusters,
         CAST(coalesce(sum(CASE WHEN num_distinct_rhs > 1 THEN cluster_size
                                ELSE 0 END), 0) AS BIGINT) AS num_violating_rows,
         CAST(coalesce(sum(cluster_size * (cluster_size - 1) - eq_pairs2x), 0)
              AS BIGINT) AS conflicts
  FROM l2)
SELECT total_rows, num_violating_clusters, num_violating_rows,
       CASE WHEN total_rows > 1
            THEN CAST(conflicts AS DOUBLE)
                 / CAST(total_rows * total_rows - total_rows AS DOUBLE)
            ELSE 0.0 END AS error,
       CAST(CASE WHEN {holds_cond} THEN 1 ELSE 0 END AS INT) AS holds
FROM m
"""

_IND_METRICS_SQL = """
WITH l AS (SELECT {lhs}, count(*) AS ref_count FROM {ltable}
           WHERE {lhs} IS NOT NULL GROUP BY {lhs}),
r AS (SELECT DISTINCT {rhs} FROM {rtable} WHERE {rhs} IS NOT NULL),
j AS (SELECT l.*, r.{rhs} AS rkey FROM l LEFT JOIN r ON l.{lhs} = r.{rhs}),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS total_distinct,
         CAST(coalesce(sum(CASE WHEN rkey IS NULL THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS num_missing_values,
         CAST(coalesce(sum(CASE WHEN rkey IS NULL THEN ref_count ELSE 0 END), 0)
              AS BIGINT) AS num_violating_rows
  FROM j)
SELECT total_distinct, num_missing_values, num_violating_rows,
       CASE WHEN total_distinct > 0
            THEN CAST(num_missing_values AS DOUBLE)
                 / CAST(total_distinct AS DOUBLE)
            ELSE 0.0 END AS error,
       CAST(CASE WHEN num_missing_values = 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM m
"""


_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"


def _minhash_oracle(num_hashes: int = 8) -> str:
    cols = ",\n       ".join(
        f"min(md5('s{j}:' || w)) AS mh{j}" for j in range(num_hashes)
    )
    return f"""
WITH t AS (SELECT doc_id, unnest({_TOKS}) AS w
           FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
d AS (SELECT DISTINCT doc_id, w FROM t WHERE w <> '')
SELECT doc_id AS id, {cols} FROM d GROUP BY doc_id
"""


def _simhash_oracle() -> str:
    chunks = []
    for c in range(4):
        terms = []
        for j in range(16):
            d = c * 4 + j // 4
            k = j % 4
            p = 2 ** (3 - k)
            bit = (
                f"(CAST(floor((strpos('0123456789abcdef', substr(md5(w), {d + 1}, 1))"
                f" - 1) / {p}.0) AS BIGINT) % 2)"
            )
            terms.append(f"CASE WHEN sum({bit} * 2 - 1) > 0 THEN {2**j} ELSE 0 END")
        chunks.append("CAST(" + " + ".join(terms) + f" AS BIGINT) AS sh{c}")
    sel = ",\n       ".join(chunks)
    return f"""
WITH t AS (SELECT doc_id, unnest({_TOKS}) AS w
           FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
d AS (SELECT DISTINCT doc_id, w FROM t WHERE w <> '')
SELECT doc_id AS id, {sel} FROM d GROUP BY doc_id
"""


def _lang_id_oracle() -> str:
    from desbordante_spark.functions.text import STOPWORDS

    hits = []
    for lang, words in STOPWORDS.items():
        pat = "\\b(" + "|".join(words) + ")\\b"
        hits.append(
            f"len(regexp_extract_all(lower(text), '{pat}')) AS h_{lang}"
        )
    hs = ",\n       ".join(hits)
    return f"""
WITH r AS (SELECT doc_id, text,
       length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk,
       {hs}
      FROM documents)
SELECT doc_id,
       CASE WHEN text IS NULL OR trim(text) = '' THEN 'unknown'
            WHEN 2 * cjk >= length(text) THEN 'zh'
            WHEN greatest(h_en, h_de, h_fr, h_es) <= 0 THEN 'unknown'
            WHEN h_en >= greatest(h_de, h_fr, h_es) THEN 'en'
            WHEN h_de >= greatest(h_fr, h_es) THEN 'de'
            WHEN h_fr >= h_es THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM r
"""


def _ind_discovery_oracle() -> str:
    ctes = []
    ids = {}
    for i, (t, c) in enumerate(_IND_COLS):
        ids[f"{t}.{c}"] = f"v{i}"
        ctes.append(
            f"v{i} AS (SELECT DISTINCT CAST({c} AS VARCHAR) AS v FROM {t}"
            f" WHERE {c} IS NOT NULL)"
        )
    selects = []
    for lt, lc in _IND_COLS:
        for rt, rc in _IND_COLS:
            lid, rid = f"{lt}.{lc}", f"{rt}.{rc}"
            if lid == rid:
                continue
            a, b = ids[lid], ids[rid]
            selects.append(
                f"SELECT '{lid}' AS lhs, '{rid}' AS rhs,"
                f" CAST((SELECT count(*) FROM {a}) AS BIGINT) AS lhs_distinct,"
                f" CAST((SELECT count(*) FROM {a} JOIN {b} USING (v)) AS BIGINT)"
                f"   AS overlap"
            )
    return (
        "WITH " + ", ".join(ctes) + ", p AS (" + " UNION ALL ".join(selects)
        + ") SELECT lhs, rhs, lhs_distinct, overlap,"
        " 1.0 - CAST(overlap AS DOUBLE) / CAST(lhs_distinct AS DOUBLE) AS error,"
        " CAST(CASE WHEN 1.0 - CAST(overlap AS DOUBLE) / CAST(lhs_distinct AS DOUBLE)"
        "   <= 0.0 THEN 1 ELSE 0 END AS INT) AS holds"
        " FROM p WHERE 1.0 - CAST(overlap AS DOUBLE) / CAST(lhs_distinct AS DOUBLE)"
        "   <= 0.0"
    )


def _afd_discovery_oracle(max_error: float = 0.3) -> str:
    """Closed-form SQL for discover_afds(orders[_AFD_COLS], max_lhs=2,
    per_tuple): per candidate X → A the error is 1 − Σ_clusters max_cnt / n;
    minimality via scalar subqueries on the subset candidates' errors
    (per_tuple is monotone in X, so any qualifying subset prunes)."""
    from itertools import combinations

    cols = sorted(_AFD_COLS)
    ctes = []
    names: dict[tuple[tuple[str, ...], str], str] = {}
    idx = 0

    def cte_for(lhs: tuple[str, ...], a: str) -> str:
        nonlocal idx
        key = (lhs, a)
        if key in names:
            return names[key]
        name = f"e{idx}"
        idx += 1
        names[key] = name
        gb = ", ".join([*lhs, a])
        lhs_gb = ", ".join(lhs) if lhs else None
        inner = (
            f"SELECT {gb}, count(*) AS cnt FROM orders GROUP BY {gb}"
        )
        mid = (
            f"SELECT sum(cnt) AS sz, max(cnt) AS keep FROM ({inner})"
            + (f" GROUP BY {lhs_gb}" if lhs_gb else "")
        )
        ctes.append(
            f"{name} AS (SELECT 1.0 - CAST(sum(keep) AS DOUBLE)"
            f" / CAST(sum(sz) AS DOUBLE) AS err FROM ({mid}))"
        )
        return name

    branches = []
    for a in cols:  # level 0: () -> a
        n0 = cte_for((), a)
        branches.append(
            f"SELECT '' AS lhs, '{a}' AS rhs, err AS error FROM {n0}"
            f" WHERE err <= {max_error!r}e0"
        )
    for x in cols:  # level 1
        for a in cols:
            if a == x:
                continue
            n1 = cte_for((x,), a)
            n0 = cte_for((), a)
            branches.append(
                f"SELECT '{x}' AS lhs, '{a}' AS rhs, err AS error FROM {n1}"
                f" WHERE err <= {max_error!r}e0"
                f" AND (SELECT err FROM {n0}) > {max_error!r}e0"
            )
    for x, y in combinations(cols, 2):  # level 2
        for a in cols:
            if a in (x, y):
                continue
            n2 = cte_for((x, y), a)
            guards = [
                f"(SELECT err FROM {cte_for((), a)}) > {max_error!r}e0",
                f"(SELECT err FROM {cte_for((x,), a)}) > {max_error!r}e0",
                f"(SELECT err FROM {cte_for((y,), a)}) > {max_error!r}e0",
            ]
            branches.append(
                f"SELECT '{x},{y}' AS lhs, '{a}' AS rhs, err AS error"
                f" FROM {n2} WHERE err <= {max_error!r}e0 AND "
                + " AND ".join(guards)
            )
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(branches)


def _od_discovery_oracle(max_swap: int = 0) -> str:
    """Closed-form SQL for discover_ods(lineitem[_OD_COLS], context
    l_orderkey, asc): per ordered pair the same grouped-window swap check as
    the od_violations oracle, aggregated to candidate verdicts."""
    branches = []
    for a in _OD_COLS:
        for b in _OD_COLS:
            if a == b:
                continue
            branches.append(f"""
SELECT 'l_orderkey' AS context, '{a}' AS lhs, '{b}' AS rhs,
       'asc' AS direction,
       CAST(coalesce(sum(CASE WHEN pm > min_bv THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS num_swap_groups,
       CAST(count(*) AS BIGINT) AS total_groups,
       CAST(CASE WHEN coalesce(sum(CASE WHEN pm > min_bv THEN 1 ELSE 0 END),
                 0) <= {max_swap} THEN 1 ELSE 0 END AS INT) AS holds
FROM (
  WITH g AS (
    SELECT l_orderkey, CAST({a} AS DOUBLE) AS av,
           min(CAST({b} AS DOUBLE)) AS min_bv,
           max(CAST({b} AS DOUBLE)) AS max_bv
    FROM lineitem
    WHERE {a} IS NOT NULL AND {b} IS NOT NULL
    GROUP BY l_orderkey, CAST({a} AS DOUBLE))
  SELECT *, max(max_bv) OVER (PARTITION BY l_orderkey ORDER BY av ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pm
  FROM g)
""")
    return " UNION ALL ".join(branches)


def _ucc_minimal_oracle() -> str:
    """Closed-form SQL for discover_uccs(orders, max_size=2): minimal keys —
    singletons with d(c) = n, pairs with d(x,y) = n whose members aren't
    keys themselves."""
    from itertools import combinations

    cols = sorted(_ORDERS_COLS)
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    for c in cols:
        aggs.append(f"count(DISTINCT {c}) AS d_{c}")
    for x, y in combinations(cols, 2):
        aggs.append(f"count(DISTINCT ({x}, {y})) AS d_{x}__{y}")
    selects = [
        f"SELECT '{c}' AS ucc FROM m WHERE d_{c} = n" for c in cols
    ]
    for x, y in combinations(cols, 2):
        selects.append(
            f"SELECT '{x},{y}' AS ucc FROM m"
            f" WHERE d_{x}__{y} = n AND d_{x} < n AND d_{y} < n"
        )
    return (
        "WITH m AS (SELECT " + ", ".join(aggs) + " FROM orders) "
        + " UNION ALL ".join(selects)
    )


def _fold_dot(a: str, b: str, dim: int = 64) -> str:
    """DuckDB dot product with Spark's exact fold order: ``F.aggregate`` is a
    left fold from 0.0, and ``list_reduce`` seeds with the first element —
    identical IEEE sums (0.0 + x == x), so bucket signs and cosines are
    bit-equal across engines."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (acc, x) -> acc + x)"
    )


def _lsh_bucket_sql(vec: str, planes: int, dim: int = 64, seed: int = 42) -> str:
    """The md5-derived hyperplane bucket (similarity.lsh_bucket) as a DuckDB
    expression — same literal plane components, same sign rule."""
    from desbordante_spark.operators.similarity import plane_components

    terms = []
    for p, comps in enumerate(plane_components(planes, dim, seed)):
        lit = "[" + ", ".join(f"{c!r}e0" for c in comps) + "]"
        dot = (
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> {vec}[i]::DOUBLE * ({lit})[i]), (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2 ** p} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS INT)"


def _embedding_cte(planes: int, dim: int = 64) -> str:
    nrm = _fold_dot("embedding", "embedding", dim)
    return (
        f"e AS (SELECT vec_id, embedding, sqrt({nrm}) AS nrm, "
        f"{_lsh_bucket_sql('embedding', planes, dim)} AS bucket "
        "FROM embeddings)"
    )


def _ann_lsh_oracle(planes: int = 6, k: int = 3, dim: int = 64) -> str:
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {2 ** p})" for p in range(planes)]
    )
    dot = _fold_dot("a.embedding", "b.embedding", dim)
    return f"""
WITH {_embedding_cte(planes, dim)},
qq AS (SELECT * FROM e WHERE vec_id < 10),
pr AS (SELECT vec_id, unnest([{probes}]) AS pb FROM qq),
cand AS (SELECT DISTINCT pr.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM pr JOIN e c ON c.bucket = pr.pb AND c.vec_id <> pr.vec_id),
sc AS (SELECT cand.query_id, cand.neighbor_id,
              {dot}
              / (CASE WHEN a.nrm * b.nrm > 0 THEN a.nrm * b.nrm
                      ELSE 1.0 END) AS cosine
       FROM cand JOIN e a ON a.vec_id = cand.query_id
                 JOIN e b ON b.vec_id = cand.neighbor_id),
r AS (SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
      FROM sc)
SELECT query_id, neighbor_id, cosine_r, rank FROM r WHERE rank <= {k}
"""


def _near_dup_oracle(
    planes: int = 4, threshold: float = 0.3, max_bucket: int = 1000,
    dim: int = 64,
) -> str:
    dot = _fold_dot("a.embedding", "b.embedding", dim)
    return f"""
WITH {_embedding_cte(planes, dim)},
sz AS (SELECT bucket, count(*) AS bsz FROM e GROUP BY bucket),
bb AS (SELECT e.* FROM e JOIN sz ON e.bucket = sz.bucket
       WHERE sz.bsz <= {max_bucket}),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {dot}
             / (CASE WHEN a.nrm * b.nrm > 0 THEN a.nrm * b.nrm
                     ELSE 1.0 END) AS cosine
      FROM bb a JOIN bb b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cosine, 6) AS cosine_r
FROM p WHERE cosine >= {threshold!r}e0
"""


def _ivf_oracle(k: int = 3, n_centroids: int = 16, nprobe: int = 4,
                dim: int = 64) -> str:
    nrm = _fold_dot("embedding", "embedding", dim)
    cos_ec = (
        _fold_dot("e.embedding", "cents.cvec", dim)
        + " / (CASE WHEN e.nrm * cents.cnrm > 0 THEN e.nrm * cents.cnrm"
        " ELSE 1.0 END)"
    )
    cos_ab = _fold_dot("a.embedding", "b.embedding", dim)
    return f"""
WITH e AS (SELECT vec_id, embedding, sqrt({nrm}) AS nrm FROM embeddings),
co AS (SELECT vec_id, embedding, nrm,
              row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
                AS rn
       FROM e),
cents AS (SELECT CAST(rn - 1 AS INT) AS centroid_id, embedding AS cvec,
                 nrm AS cnrm
          FROM co WHERE rn <= {n_centroids}),
scored AS (SELECT e.vec_id, cents.centroid_id, {cos_ec} AS cos
           FROM e CROSS JOIN cents),
ranked AS (SELECT vec_id, centroid_id,
                  row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, centroid_id ASC) AS rn
           FROM scored),
cb AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
qp AS (SELECT vec_id AS query_id, centroid_id FROM ranked
       WHERE vec_id < 10 AND rn <= {nprobe}),
cand AS (SELECT qp.query_id, cb.vec_id AS neighbor_id
         FROM qp JOIN cb ON cb.centroid_id = qp.centroid_id
         WHERE cb.vec_id <> qp.query_id),
sc AS (SELECT cand.query_id, cand.neighbor_id,
              {cos_ab}
              / (CASE WHEN a.nrm * b.nrm > 0 THEN a.nrm * b.nrm
                      ELSE 1.0 END) AS cosine
       FROM cand JOIN e a ON a.vec_id = cand.query_id
                 JOIN e b ON b.vec_id = cand.neighbor_id),
r AS (SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
      FROM sc)
SELECT query_id, neighbor_id, cosine_r, rank FROM r WHERE rank <= {k}
"""


_KINDS_SQL = "('text', 'image', 'audio', 'video')"


def _span_invariant_oracle() -> str:
    return f"""
WITH d AS (SELECT doc_id, spans FROM read_parquet('{_DOCS_PATH}/*.parquet')),
r AS (SELECT doc_id,
  len(list_filter(list_transform(range(1, len(spans) + 1),
      i -> spans[i]."offset" <> i - 1), x -> x)) > 0 AS bad_offset,
  len(list_filter(spans, s -> s.kind IS NULL
      OR s.kind NOT IN {_KINDS_SQL})) > 0 AS bad_kind,
  len(list_filter(spans, s -> CASE WHEN s.kind = 'text'
      THEN (s.text IS NULL OR s.text = '')
      ELSE (s.text IS NULL OR s.text <> '') END)) > 0 AS bad_text,
  len(list_filter(spans, s -> CASE WHEN s.kind = 'text'
      THEN s.media_ref IS NOT NULL
      ELSE s.media_ref IS NULL END)) > 0 AS bad_ref
FROM d)
SELECT doc_id,
       concat_ws(',',
         CASE WHEN bad_offset THEN 'offset_order' END,
         CASE WHEN bad_kind THEN 'bad_kind' END,
         CASE WHEN bad_text THEN 'text_presence' END,
         CASE WHEN bad_ref THEN 'media_ref_presence' END) AS reasons
FROM r WHERE bad_offset OR bad_kind OR bad_text OR bad_ref
"""


def _span_equality_oracle() -> str:
    """Canonical span serialization (offset-sorted, injective field join)
    compared across the two staged tables — equivalent to the library's
    struct-array comparison because the serialization is injective and
    zero-padded offsets sort lexicographically like integers."""
    canon = (
        "array_to_string(list_sort(list_transform(spans, s -> "
        "lpad(CAST(s.\"offset\" AS VARCHAR), 4, '0') || chr(31) || s.kind"
        " || chr(31) || coalesce(s.text, chr(30)) || chr(31)"
        " || coalesce(s.media_ref, chr(30)))), chr(29))"
    )
    return f"""
WITH a AS (SELECT doc_id, {canon} AS ca
           FROM read_parquet('{_DOCS_PATH}/*.parquet')),
b AS (SELECT doc_id, {canon} AS cb
      FROM read_parquet('{_DOCS_CLEAN_PATH}/*.parquet')),
j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, ca, cb
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id),
s AS (SELECT doc_id,
             CASE WHEN ca IS NULL THEN 'only_right'
                  WHEN cb IS NULL THEN 'only_left'
                  WHEN ca <> cb THEN 'mismatch' END AS status
      FROM j)
SELECT doc_id, status FROM s WHERE status IS NOT NULL
"""


def _referential_staged_oracle() -> str:
    return f"""
WITH refs AS (SELECT s.media_ref AS media_ref
              FROM (SELECT unnest(spans) AS s
                    FROM read_parquet('{_DOCS_PATH}/*.parquet'))),
l AS (SELECT media_ref, count(*) AS ref_count FROM refs
      WHERE media_ref IS NOT NULL GROUP BY media_ref),
r AS (SELECT DISTINCT media_ref
      FROM read_parquet('{_CAT_PATH}/*.parquet')
      WHERE media_ref IS NOT NULL),
j AS (SELECT l.*, r.media_ref AS rkey FROM l
      LEFT JOIN r ON l.media_ref = r.media_ref),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS total_distinct,
         CAST(coalesce(sum(CASE WHEN rkey IS NULL THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS num_missing_values,
         CAST(coalesce(sum(CASE WHEN rkey IS NULL THEN ref_count ELSE 0 END), 0)
              AS BIGINT) AS num_violating_rows
  FROM j)
SELECT total_distinct, num_missing_values, num_violating_rows,
       CASE WHEN total_distinct > 0
            THEN CAST(num_missing_values AS DOUBLE)
                 / CAST(total_distinct AS DOUBLE)
            ELSE 0.0 END AS error,
       CAST(CASE WHEN num_missing_values = 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM m
"""


def _nary_ind_oracle() -> str:
    """Mind over {orders_sample (o_orderkey%7=0), orders} × (o_custkey,
    o_orderpriority): every arity ≤ 2 candidate is probed directly (a
    holding n-ary IND implies holding projections, so unconditional probing
    equals the levelwise gating)."""
    tables = {"orders_sample": "s", "orders": "orders"}
    cols = ["o_custkey", "o_orderpriority"]
    ctes = ["s AS (SELECT * FROM orders WHERE o_orderkey % 7 = 0)"]
    branches = []
    idx = 0

    def proj(alias: str, table_sql: str, cs: list[str]) -> str:
        sel = ", ".join(
            f"CAST({c} AS VARCHAR) AS v{i}" for i, c in enumerate(cs)
        )
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cs)
        return f"{alias} AS (SELECT DISTINCT {sel} FROM {table_sql} WHERE {notnull})"

    from itertools import permutations

    cand: list[tuple[str, list[str], str, list[str]]] = []
    for lt in tables:
        for rt in tables:
            for lc in cols:
                for rc in cols:
                    if lt == rt and lc == rc:  # identical projection
                        continue
                    cand.append((lt, [lc], rt, [rc]))
            for rperm in permutations(cols):
                if lt == rt and list(rperm) == list(cols):
                    continue
                cand.append((lt, list(cols), rt, list(rperm)))
    for lt, lcs, rt, rcs in cand:
        la, ra, ca = f"l{idx}", f"r{idx}", f"c{idx}"
        ctes.append(proj(la, tables[lt], lcs))
        ctes.append(proj(ra, tables[rt], rcs))
        on = " AND ".join(f"{la}.v{i} = {ra}.v{i}" for i in range(len(lcs)))
        ctes.append(
            f"{ca} AS (SELECT CAST(count(*) AS BIGINT) AS nd, "
            f"CAST(coalesce(sum(CASE WHEN {ra}.v0 IS NULL THEN 1 ELSE 0 END), 0)"
            f" AS BIGINT) AS miss FROM {la} LEFT JOIN {ra} ON {on})"
        )
        lhs = f"{lt}[{','.join(lcs)}]"
        rhs = f"{rt}[{','.join(rcs)}]"
        branches.append(
            f"SELECT '{lhs}' AS lhs, '{rhs}' AS rhs, {len(lcs)} AS arity, "
            f"nd AS lhs_distinct, miss AS missing FROM {ca}"
        )
        idx += 1
    return (
        "WITH " + ",\n".join(ctes) + ",\np AS (" + " UNION ALL ".join(branches)
        + ") SELECT lhs, rhs, CAST(arity AS INT) AS arity, lhs_distinct, "
        "missing, 0.0e0 AS error, CAST(1 AS INT) AS holds "
        "FROM p WHERE lhs_distinct > 0 AND missing = 0"
    )


def _cfd_tableau_oracle() -> str:
    patterns = [("F", 0), ("O", 1), ("P", 2)]
    parts = []
    for val, pid in patterns:
        parts.append(f"""
SELECT {pid} AS pattern_id, 'o_orderstatus={val}' AS pattern,
       support, num_violating_clusters, num_violating_rows, error,
       1.0 - error AS confidence,
       CAST(CASE WHEN error <= 0.001 AND support >= 100
            THEN 1 ELSE 0 END AS INT) AS holds
FROM (
  WITH sub AS (SELECT * FROM orders WHERE o_orderstatus = '{val}'),
  l1 AS (SELECT o_custkey, o_orderpriority, count(*) AS cnt
         FROM sub GROUP BY o_custkey, o_orderpriority),
  l2 AS (SELECT o_custkey,
                CAST(sum(cnt) AS BIGINT) AS cluster_size,
                CAST(count(*) AS BIGINT) AS num_distinct_rhs,
                CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS eq_pairs2x
         FROM l1 GROUP BY o_custkey),
  m AS (
    SELECT CAST(coalesce(sum(cluster_size), 0) AS BIGINT) AS support,
           CAST(coalesce(sum(CASE WHEN num_distinct_rhs > 1 THEN 1 ELSE 0 END),
                0) AS BIGINT) AS num_violating_clusters,
           CAST(coalesce(sum(CASE WHEN num_distinct_rhs > 1 THEN cluster_size
                             ELSE 0 END), 0) AS BIGINT) AS num_violating_rows,
           CAST(coalesce(sum(cluster_size * (cluster_size - 1) - eq_pairs2x),
                0) AS BIGINT) AS conflicts
    FROM l2)
  SELECT support, num_violating_clusters, num_violating_rows,
         CASE WHEN support > 1
              THEN CAST(conflicts AS DOUBLE)
                   / CAST(support * support - support AS DOUBLE)
              ELSE 0.0 END AS error
  FROM m)
""")
    return " UNION ALL ".join(parts)


def _aucc_discovery_oracle() -> str:
    """Closed-form SQL for discover_auccs(orders[_AUCC_COLS], max_size=2,
    max_error): singletons qualify on error ≤ t; a pair is EVALUATED only
    when both members failed (the levelwise generator) and qualifies on its
    own error. error = Σc(c−1)/(n(n−1)) with exact BIGINT pair sums."""
    from itertools import combinations

    cols = sorted(_AUCC_COLS)
    t = f"{_AUCC_MAX_ERR}e0"  # e0 → DOUBLE literal (plain parses as DECIMAL)

    def ep(cs: tuple[str, ...]) -> str:
        return "ep_" + "__".join(cs)

    ctes = ["n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)"]
    sets = [(c,) for c in cols] + list(combinations(cols, 2))
    for s in sets:
        grp = ", ".join(s)
        ctes.append(
            f"{ep(s)} AS (SELECT CAST(coalesce(sum(cnt * (cnt - 1)), 0) "
            f"AS BIGINT) AS ep FROM (SELECT count(*) AS cnt FROM orders "
            f"GROUP BY {grp}))"
        )

    def err(s: tuple[str, ...]) -> str:
        return (
            f"(SELECT CAST(ep AS DOUBLE) FROM {ep(s)})"
            f" / (SELECT CAST(n * (n - 1) AS DOUBLE) FROM n)"
        )

    selects = []
    for c in cols:
        selects.append(
            f"SELECT '{c}' AS aucc, {err((c,))} AS error FROM n"
            f" WHERE {err((c,))} <= {t}"
        )
    for x, y in combinations(cols, 2):
        selects.append(
            f"SELECT '{x},{y}' AS aucc, {err((x, y))} AS error FROM n"
            f" WHERE {err((x, y))} <= {t}"
            f" AND {err((x,))} > {t} AND {err((y,))} > {t}"
        )
    return "WITH " + ",\n".join(ctes) + " " + " UNION ALL ".join(selects)


def _near_dup_minhash_oracle() -> str:
    """Closed-form SQL for near_duplicates(documents, threshold=0.5,
    num_hashes=8, bands=4, shingle_words=2, max_bucket=200): 2-word
    shingles (Spark slice semantics: when a doc has <2 tokens the single
    token is the shingle), per-doc min of md5('s<j>:'||shingle), band hash
    md5(mh_{2b}||'|'||mh_{2b+1}), bucket pairs with 2 ≤ bucket ≤ 200,
    exact Jaccard from shingle-set joins."""
    mh = ", ".join(
        f"min(md5('s{j}:' || shingle)) AS mh{j}" for j in range(8)
    )
    bands = " UNION ALL ".join(
        f"SELECT id, {b} AS band_idx,"
        f" md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS band_hash FROM sigs"
        for b in range(4)
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
sh AS (
  SELECT DISTINCT id, shingle FROM (
    SELECT id,
           unnest(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                                 i -> array_to_string(t[i:i+1], ' ')))
             AS shingle
    FROM toks
  ) WHERE shingle <> ''
),
sigs AS (SELECT id, {mh} FROM sh GROUP BY id),
bandrows AS ({bands}),
bsz AS (SELECT band_idx, band_hash, count(*) AS n
        FROM bandrows GROUP BY band_idx, band_hash),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bandrows a
  JOIN bandrows b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.id < b.id
  JOIN bsz s ON s.band_idx = a.band_idx AND s.band_hash = a.band_hash
  WHERE s.n BETWEEN 2 AND 200
),
sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS inter
  FROM pairs p
  JOIN sh a ON a.id = p.id_a
  JOIN sh b ON b.id = p.id_b AND b.shingle = a.shingle
  GROUP BY p.id_a, p.id_b
)
SELECT p.id_a, p.id_b,
       CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
       CAST(sa.set_size AS BIGINT) AS size_a,
       CAST(sb.set_size AS BIGINT) AS size_b,
       CAST(coalesce(i.inter, 0) AS DOUBLE)
         / CAST(sa.set_size + sb.set_size - coalesce(i.inter, 0) AS DOUBLE)
         AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN sizes sa ON sa.id = p.id_a
JOIN sizes sb ON sb.id = p.id_b
WHERE CAST(coalesce(i.inter, 0) AS DOUBLE)
      / CAST(sa.set_size + sb.set_size - coalesce(i.inter, 0) AS DOUBLE)
      >= 0.5e0
"""


def _cfd_discovery_oracle() -> str:
    """Closed-form SQL for discover_cfds(orders, _CFD_COLS, minsup, minconf,
    max_lhs=2): per candidate (lhs attr-set, constant subset, rhs attr) the
    same three-level aggregation — value counts, per-wildcard-group best RHS
    (window rn=1 ≡ Spark min(struct(-cnt, rv))), per-pattern
    support/satisfied — then the minsup/minconf filter."""
    from itertools import combinations

    cols = sorted(_CFD_COLS)
    ctes = [
        "src AS (SELECT o_orderstatus, o_orderpriority,"
        " substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS o_year FROM orders)"
    ]
    branches = []
    idx = 0
    for k in (1, 2):
        for s in combinations(cols, k):
            for csize in range(0, k + 1):
                for c in combinations(s, csize):
                    cset = set(c)
                    for b in cols:
                        if b in s:
                            continue
                        pieces = [
                            f"concat('{a}=', CAST({a} AS VARCHAR))"
                            if a in cset else f"'{a}=_'"
                            for a in s
                        ]
                        pat = (
                            "concat_ws(' AND ', " + ", ".join(pieces) + ")"
                            if len(pieces) > 1 else pieces[0]
                        )
                        var_attrs = [a for a in s if a not in cset]
                        vk = (
                            "concat_ws(chr(1), "
                            + ", ".join(f"CAST({a} AS VARCHAR)"
                                        for a in var_attrs)
                            + ")"
                            if var_attrs else "''"
                        )
                        nn = " AND ".join(
                            f"{a} IS NOT NULL" for a in (*s, b)
                        )
                        is_const = int(len(c) == len(s))
                        ctes.append(f"""
c{idx} AS (SELECT {pat} AS pat, {vk} AS vk, CAST({b} AS VARCHAR) AS rv,
                  count(*) AS cnt
           FROM src WHERE {nn} GROUP BY 1, 2, 3),
g{idx} AS (SELECT pat, vk, cnt, rv,
                  sum(cnt) OVER (PARTITION BY pat, vk) AS gs,
                  row_number() OVER (PARTITION BY pat, vk
                                     ORDER BY cnt DESC, rv ASC) AS rn
           FROM c{idx}),
p{idx} AS (SELECT pat,
                  CAST(sum(CASE WHEN rn = 1 THEN gs END) AS BIGINT)
                    AS support,
                  CAST(sum(CASE WHEN rn = 1 THEN cnt END) AS BIGINT)
                    AS satisfied,
                  min(CASE WHEN rn = 1 THEN rv END) AS best_rv
           FROM g{idx} GROUP BY pat)""")
                        rhs = (
                            f"concat('{b}=', best_rv)"
                            if is_const else f"'{b}=_'"
                        )
                        branches.append(f"""
SELECT pat AS lhs_pattern, '{b}' AS rhs_attr, {rhs} AS rhs,
       CAST({k} AS INT) AS lhs_size, support, satisfied,
       CAST(satisfied AS DOUBLE) / CAST(support AS DOUBLE) AS confidence,
       CAST({is_const} AS INT) AS is_constant_rhs
FROM p{idx}
WHERE support >= {_CFD_MINSUP}
  AND CAST(satisfied AS DOUBLE) / CAST(support AS DOUBLE) >= {_CFD_MINCONF}""")
                        idx += 1
    return "WITH " + ",".join(ctes) + " " + " UNION ALL ".join(branches)


def _od_auto_oracle() -> str:
    """Closed-form SQL for discover_ods_auto(lineitem charge view): every
    (context ⊆ {l_returnflag, l_tax}, pair, asc) candidate is computed, then
    the minimality filter — a candidate row is emitted only when NO proper
    subset context holds for the same pair (pruned candidates are absent,
    exactly as the levelwise miner evaluates them)."""
    from itertools import combinations

    ctx_pool = ["l_returnflag", "l_tax"]
    pairs = [("charge", "l_extendedprice"), ("l_extendedprice", "charge")]
    ctx_sets = [
        tuple(c) for lvl in range(0, 3)
        for c in combinations(ctx_pool, lvl)
    ]
    base = (
        "base AS (SELECT l_returnflag, l_tax,"
        " CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,"
        " CAST(l_extendedprice AS DOUBLE) * (1.0e0 + CAST(l_tax AS DOUBLE))"
        " AS charge FROM lineitem)"
    )
    ctes = [base]
    cand_id: dict[tuple, int] = {}
    for i, (ctx, (a, b)) in enumerate(
        [(ctx, p) for ctx in ctx_sets for p in pairs]
    ):
        cand_id[(ctx, a, b)] = i
        part = ("PARTITION BY " + ", ".join(ctx) + " ") if ctx else ""
        grp = ", ".join([*ctx, "av"])
        sel = (", ".join(ctx) + ", ") if ctx else ""
        ctes.append(f"""
c{i} AS (
  SELECT CAST(coalesce(sum(CASE WHEN pm > min_bv THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS nsw,
         CAST(count(*) AS BIGINT) AS tg
  FROM (
    WITH g AS (
      SELECT {sel}{a} AS av, min({b}) AS min_bv, max({b}) AS max_bv
      FROM base WHERE {a} IS NOT NULL AND {b} IS NOT NULL
      GROUP BY {grp})
    SELECT *, max(max_bv) OVER ({part}ORDER BY av ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pm
    FROM g))""")
    branches = []
    for (ctx, a, b), i in cand_id.items():
        subs = [
            cand_id[(sub, a, b)]
            for lvl in range(len(ctx))
            for sub in combinations(ctx, lvl)
        ]
        where = (
            "WHERE " + " AND ".join(f"(SELECT nsw FROM c{j}) > 0"
                                    for j in subs)
            if subs else ""
        )
        branches.append(f"""
SELECT '{",".join(ctx)}' AS context, '{a}' AS lhs, '{b}' AS rhs,
       'asc' AS direction, nsw AS num_swap_groups, tg AS total_groups,
       CAST(CASE WHEN nsw <= 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM c{i} {where}""")
    return "WITH " + ",".join(c for c in ctes) + " " \
        + " UNION ALL ".join(branches)




_TYPE_INFER_SQL = """
WITH src AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS ok,
         CAST(o_orderdate AS VARCHAR) AS od,
         o_orderstatus AS st,
         CAST(o_orderkey % 1000 AS VARCHAR) || '.' ||
           CAST(o_custkey % 100 AS VARCHAR) AS dbl,
         CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_custkey AS VARCHAR)
              ELSE o_orderstatus END AS mix,
         CASE WHEN o_orderkey % 3 = 0 THEN 'NULL'
              WHEN o_orderkey % 3 = 1 THEN ''
              ELSE CAST(o_custkey AS VARCHAR) END AS nully
  FROM orders),
vals AS (
  SELECT 'ok' AS col_name, ok AS val FROM src UNION ALL
  SELECT 'od', od FROM src UNION ALL
  SELECT 'st', st FROM src UNION ALL
  SELECT 'dbl', dbl FROM src UNION ALL
  SELECT 'mix', mix FROM src UNION ALL
  SELECT 'nully', nully FROM src),
classed AS (
  SELECT col_name,
         (val IS NULL OR val = 'NULL') AS is_null,
         (val IS NOT NULL AND val = '') AS is_empty,
         CASE
           WHEN regexp_matches(val, '^[0-9]{4}[-/.](0?[1-9]|1[0-2])[-/.](0?[1-9]|[12][0-9]|3[01])$')
                AND try_cast(translate(val, '/.', '--') AS DATE) IS NOT NULL
                AND substring(translate(val, '/.', '--'), 1, 4) >= '1400' THEN 'date'
           WHEN regexp_matches(val, '^[0-9]{4}(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])$')
                AND try_cast(substring(val, 1, 4) || '-' || substring(val, 5, 2)
                             || '-' || substring(val, 7, 2) AS DATE) IS NOT NULL
                AND substring(val, 1, 4) >= '1400' THEN 'udate'
           WHEN regexp_matches(val, '^[+-]?[0-9]{1,19}$') THEN 'int'
           WHEN regexp_matches(val, '^[+-]?[0-9]{20,}$') THEN 'bigint'
           WHEN regexp_matches(val, '^[+-]?([0-9]+\\.[0-9]*|\\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$') THEN 'double'
           ELSE 'string' END AS cls
  FROM vals),
masked AS (
  SELECT col_name, is_null, is_empty,
         CASE WHEN is_null OR is_empty THEN NULL ELSE cls END AS cls,
         CASE WHEN is_null OR is_empty THEN 31
              WHEN cls = 'date' THEN 1
              WHEN cls = 'udate' THEN 15
              WHEN cls = 'int' THEN 14
              WHEN cls = 'bigint' THEN 12
              WHEN cls = 'double' THEN 8
              ELSE 16 END AS mask
  FROM classed),
agg AS (
  SELECT col_name, bit_and(mask) AS mask,
         CAST(count(CASE WHEN cls IS NOT NULL THEN 1 END) AS BIGINT) AS n_values,
         CAST(count(CASE WHEN is_null THEN 1 END) AS BIGINT) AS n_null,
         CAST(count(CASE WHEN NOT is_null AND is_empty THEN 1 END) AS BIGINT) AS n_empty,
         CAST(count(CASE WHEN cls IN ('date','udate') THEN 1 END) AS BIGINT) AS n_date,
         CAST(count(CASE WHEN cls = 'int' THEN 1 END) AS BIGINT) AS n_int,
         CAST(count(CASE WHEN cls = 'bigint' THEN 1 END) AS BIGINT) AS n_bigint,
         CAST(count(CASE WHEN cls = 'double' THEN 1 END) AS BIGINT) AS n_double,
         CAST(count(CASE WHEN cls = 'string' THEN 1 END) AS BIGINT) AS n_string
  FROM masked GROUP BY col_name)
SELECT col_name,
       CASE WHEN n_values = 0 THEN 'undefined'
            WHEN (mask & 1) > 0 THEN 'date'
            WHEN (mask & 2) > 0 THEN 'int'
            WHEN (mask & 4) > 0 THEN 'bigint'
            WHEN (mask & 8) > 0 THEN 'double'
            WHEN (mask & 16) > 0 THEN 'string'
            ELSE 'mixed' END AS inferred_type,
       n_values, n_null, n_empty, n_date, n_int, n_bigint, n_double, n_string
FROM agg
"""


_DRIFT_EVENTS_SQL = """
WITH b AS (
  SELECT event_type AS partition,
         CAST(CAST(floor(value / 10.0) AS BIGINT) AS VARCHAR) AS bucket,
         count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT bucket, sum(cnt) AS tb FROM b GROUP BY 1),
grid AS (SELECT p.partition, t.bucket, t.tb
         FROM (SELECT DISTINCT partition FROM b) p CROSS JOIN tot t),
g AS (SELECT grid.partition, grid.bucket,
             coalesce(b.cnt, 0) AS o1,
             grid.tb - coalesce(b.cnt, 0) AS o2
      FROM grid LEFT JOIN b
        ON b.partition = grid.partition AND b.bucket = grid.bucket),
g2 AS (SELECT *,
              sum(o1) OVER (PARTITION BY partition) AS n1,
              sum(o2) OVER (PARTITION BY partition) AS n2
       FROM g),
g3 AS (SELECT *,
              abs(CAST(sum(o1) OVER w AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(sum(o2) OVER w AS DOUBLE) / CAST(n2 AS DOUBLE))
                AS cdf_diff,
              CASE WHEN o1 + o2 > 0 THEN
                (CAST(o1 AS DOUBLE)
                   - CAST(n1 AS DOUBLE) * CAST(o1 + o2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                * (CAST(o1 AS DOUBLE)
                   - CAST(n1 AS DOUBLE) * CAST(o1 + o2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                / (CAST(n1 AS DOUBLE) * CAST(o1 + o2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                +
                (CAST(o2 AS DOUBLE)
                   - CAST(n2 AS DOUBLE) * CAST(o1 + o2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                * (CAST(o2 AS DOUBLE)
                   - CAST(n2 AS DOUBLE) * CAST(o1 + o2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                / (CAST(n2 AS DOUBLE) * CAST(o1 + o2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              ELSE 0.0 END AS chi2_term
       FROM g2
       WINDOW w AS (PARTITION BY partition
                    ORDER BY coalesce(TRY_CAST(bucket AS DOUBLE), 1e308), bucket
                    ROWS UNBOUNDED PRECEDING)),
m AS (SELECT partition,
             CAST(max(n1) AS BIGINT) AS n_rows,
             CAST(max(n2) AS BIGINT) AS n_baseline,
             max(cdf_diff) AS ks_stat,
             sum(chi2_term) AS chi2_stat
      FROM g3 GROUP BY partition)
SELECT partition, n_rows, n_baseline, ks_stat, chi2_stat,
       CAST(CASE WHEN ks_stat > 0.1 THEN 1 ELSE 0 END AS INT) AS drifted
FROM m WHERE n_rows > 0
"""


def oracle_sql() -> dict[str, str]:
    return {
        "type_inference_orders": _TYPE_INFER_SQL,
        "ucc_violations_orders_custkey": (
            "SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt FROM orders "
            "GROUP BY o_custkey HAVING count(*) > 1"
        ),
        "ucc_metrics_orders_custkey": _UCC_METRICS_SQL.format(
            cols="o_custkey", table="orders"
        ),
        "ucc_metrics_lineitem_pk": _UCC_METRICS_SQL.format(
            cols="l_orderkey, l_linenumber", table="lineitem"
        ),
        "fd_violations_orders": """
WITH l1 AS (SELECT o_custkey, o_orderpriority, count(*) AS cnt
            FROM orders GROUP BY o_custkey, o_orderpriority),
l2 AS (SELECT o_custkey,
              CAST(sum(cnt) AS BIGINT) AS cluster_size,
              CAST(count(*) AS BIGINT) AS num_distinct_rhs,
              CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS eq_pairs2x,
              CAST(max(cnt) AS BIGINT) AS max_rhs_cnt
       FROM l1 GROUP BY o_custkey)
SELECT o_custkey, cluster_size, num_distinct_rhs,
       CAST(max_rhs_cnt AS DOUBLE) / CAST(cluster_size AS DOUBLE)
         AS most_frequent_rhs_proportion,
       CAST(cluster_size * (cluster_size - 1) - eq_pairs2x AS BIGINT)
         AS conflict_pairs
FROM l2 WHERE num_distinct_rhs > 1
""",
        "fd_metrics_orders": _FD_METRICS_SQL.format(
            lhs="o_custkey", rhs="o_orderpriority", table="orders",
            holds_cond="num_violating_clusters = 0",
        ),
        "afd_metrics_lineitem": _FD_METRICS_SQL.format(
            lhs="l_partkey", rhs="l_suppkey", table="lineitem",
            holds_cond=(
                "(CASE WHEN total_rows > 1 THEN CAST(conflicts AS DOUBLE)"
                " / CAST(total_rows * total_rows - total_rows AS DOUBLE)"
                " ELSE 0.0 END) <= 0.05"
            ),
        ),
        "ind_metrics_lineitem_orders": _IND_METRICS_SQL.format(
            lhs="l_orderkey", ltable="lineitem",
            rhs="o_orderkey", rtable="orders",
        ),
        "ind_missing_events_customer": """
SELECT l.user_id, CAST(count(*) AS BIGINT) AS ref_count
FROM events l
WHERE l.user_id IS NOT NULL
  AND l.user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
GROUP BY l.user_id
""",
        "stats_profile_lineitem": """
SELECT 'l_quantity' AS col_name,
       CAST(count(l_quantity) AS BIGINT) AS count_values,
       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_count,
       CAST(count(DISTINCT l_quantity) AS BIGINT) AS distinct_values,
       CAST(min(l_quantity) AS VARCHAR) AS min_value,
       CAST(max(l_quantity) AS VARCHAR) AS max_value,
       CAST(sum(CASE WHEN l_quantity = 0 THEN 1 ELSE 0 END) AS BIGINT) AS num_zeros,
       CAST(sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS num_negatives,
       round(avg(l_quantity), 6) AS avg_rounded
FROM lineitem
UNION ALL
SELECT 'l_linenumber',
       CAST(count(l_linenumber) AS BIGINT),
       CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT l_linenumber) AS BIGINT),
       CAST(min(l_linenumber) AS VARCHAR),
       CAST(max(l_linenumber) AS VARCHAR),
       CAST(sum(CASE WHEN l_linenumber = 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN l_linenumber < 0 THEN 1 ELSE 0 END) AS BIGINT),
       round(avg(l_linenumber), 6)
FROM lineitem
UNION ALL
SELECT 'l_returnflag',
       CAST(count(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag <> ''
                       THEN 1 END) AS BIGINT),
       CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT CASE WHEN l_returnflag <> '' THEN l_returnflag END)
            AS BIGINT),
       CAST(min(CASE WHEN l_returnflag <> '' THEN l_returnflag END) AS VARCHAR),
       CAST(max(CASE WHEN l_returnflag <> '' THEN l_returnflag END) AS VARCHAR),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM lineitem
""",
        # incremental ≡ full: the Spark side runs the base+delta snapshot
        # chain; the oracle is the FULL-table profile (exact fields only)
        "profile_incremental_documents": """
SELECT 'lang' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_count,
       CAST(sum(CASE WHEN lang = '' THEN 1 ELSE 0 END) AS BIGINT)
         AS empty_count,
       CAST(count(CASE WHEN lang IS NOT NULL AND lang <> '' THEN 1 END)
            AS BIGINT) AS count_values,
       CAST(NULL AS BIGINT) AS min_num,
       CAST(NULL AS BIGINT) AS max_num,
       CAST(NULL AS BIGINT) AS sum_num,
       min(CASE WHEN lang <> '' THEN lang END) AS min_str,
       max(CASE WHEN lang <> '' THEN lang END) AS max_str
FROM documents
UNION ALL
SELECT 'source',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN source = '' THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(CASE WHEN source IS NOT NULL AND source <> '' THEN 1 END)
            AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       min(CASE WHEN source <> '' THEN source END),
       max(CASE WHEN source <> '' THEN source END)
FROM documents
UNION ALL
SELECT 'n_chars',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(0 AS BIGINT),
       CAST(count(n_chars) AS BIGINT),
       CAST(min(n_chars) AS BIGINT),
       CAST(max(n_chars) AS BIGINT),
       CAST(sum(n_chars) AS BIGINT),
       CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR)
FROM documents
""",
        "stats_profile_lineitem_approx": """
SELECT 'l_quantity' AS col_name,
       CAST(count(l_quantity) AS BIGINT) AS count_values,
       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_count,
       CAST(1 AS INT) AS has_distinct,
       CAST(3 AS INT) AS n_quantiles,
       round(avg(l_quantity), 6) AS avg_rounded
FROM lineitem
UNION ALL
SELECT 'l_linenumber',
       CAST(count(l_linenumber) AS BIGINT),
       CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(1 AS INT), CAST(3 AS INT),
       round(avg(l_linenumber), 6)
FROM lineitem
UNION ALL
SELECT 'l_extendedprice',
       CAST(count(l_extendedprice) AS BIGINT),
       CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(1 AS INT), CAST(3 AS INT),
       round(avg(l_extendedprice), 6)
FROM lineitem
""",
        "dynamic_fd_orders": _FD_METRICS_SQL.format(
            lhs="o_custkey", rhs="o_orderpriority",
            table=(
                "(SELECT * FROM orders WHERE (o_orderkey % 3 <> 0 AND "
                "o_orderkey % 5 <> 0) OR (o_orderkey % 3 = 0 AND "
                "o_orderkey % 2 = 0)) dyn"
            ),
            holds_cond="num_violating_clusters = 0",
        ),
        "dynamic_fd_incremental_orders": _FD_METRICS_SQL.format(
            lhs="o_custkey", rhs="o_orderpriority",
            table=(
                "(SELECT * FROM orders WHERE (o_orderkey % 3 <> 0 AND "
                "o_orderkey % 5 <> 0) OR (o_orderkey % 3 = 0 AND "
                "o_orderkey % 2 = 0)) dyn"
            ),
            holds_cond="num_violating_clusters = 0",
        ),
        "quality_score_documents": f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks,
                  length(text) AS n_chars
           FROM documents WHERE text IS NOT NULL),
f AS (SELECT doc_id,
        CAST(n_chars AS BIGINT) AS n_chars,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CASE WHEN len(toks) > 0
             THEN CAST(list_sum(list_transform(toks, w -> length(w)))
                       AS DOUBLE) / CAST(len(toks) AS DOUBLE)
             ELSE 0.0e0 END AS mwl,
        CASE WHEN n_chars > 0 THEN CAST(n_chars AS DOUBLE)
             ELSE 1.0e0 END AS nz,
        CAST(length(regexp_replace(text, '[^\\.,;:!\\?''"()\\[\\]-]', '', 'g'))
             AS DOUBLE) AS n_punct,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
          AS n_digit,
        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
          AS n_alpha,
        CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
          AS n_upper
      FROM t)
SELECT doc_id, n_chars, n_tokens, round(mwl, 6) AS mean_word_len_r,
       round(0.4e0 * least(CAST(n_tokens AS DOUBLE) / 20.0e0, 1.0e0)
             + 0.4e0 * (n_alpha / nz)
             + 0.2e0 * (1.0e0 - (least(n_digit / nz * 4.0e0, 1.0e0)
                                 + least(n_punct / nz * 4.0e0, 1.0e0)
                                 + least(n_upper / nz * 2.0e0, 1.0e0))
                        / 3.0e0), 6) AS quality
FROM f
""",
        "word_stats_documents": """
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
)
SELECT CAST(count(DISTINCT word) AS BIGINT) AS distinct_words,
       CAST(count(*) AS BIGINT) AS total_words
FROM w WHERE word <> ''
""",
        "top_words_documents": """
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
c AS (SELECT word, count(*) AS freq FROM w WHERE word <> '' GROUP BY word),
r AS (SELECT word, CAST(freq AS BIGINT) AS freq,
             CAST(row_number() OVER (ORDER BY freq DESC, word ASC) AS INT) AS rank
      FROM c)
SELECT word, freq, rank FROM r WHERE rank <= 10
""",
        # drift_incremental_events shares this SQL verbatim: the histogram
        # state is exact, so the incremental chain MUST equal the
        # full-table drift run
        "drift_events_by_type": _DRIFT_EVENTS_SQL,
        "drift_incremental_events": _DRIFT_EVENTS_SQL,
        # the per-partition lineage rollup of the incrementally maintained
        # profile state == a plain per-partition SQL profile (exact fields)
        "profile_lineage_documents": """
WITH d AS (
  SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS partition, *
  FROM documents)
SELECT partition, 'lang' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_count,
       CAST(count(CASE WHEN lang IS NOT NULL AND lang <> '' THEN 1 END)
            AS BIGINT) AS count_values,
       CAST(NULL AS BIGINT) AS min_num,
       CAST(NULL AS BIGINT) AS max_num,
       CAST(NULL AS BIGINT) AS sum_num,
       min(CASE WHEN lang <> '' THEN lang END) AS min_str,
       max(CASE WHEN lang <> '' THEN lang END) AS max_str
FROM d GROUP BY partition
UNION ALL
SELECT partition, 'n_chars',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(n_chars) AS BIGINT),
       CAST(min(n_chars) AS BIGINT),
       CAST(max(n_chars) AS BIGINT),
       CAST(sum(n_chars) AS BIGINT),
       CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR)
FROM d GROUP BY partition
""",
        "od_violations_lineitem": """
WITH g AS (
  SELECT l_orderkey, l_linenumber,
         CAST(count(*) AS BIGINT) AS group_size,
         min(l_quantity) AS min_rhs,
         max(l_quantity) AS max_rhs
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY l_orderkey, l_linenumber),
w AS (
  SELECT *, max(max_rhs) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS prev_max_rhs
  FROM g)
SELECT l_orderkey, l_linenumber, group_size, min_rhs, prev_max_rhs
FROM w WHERE prev_max_rhs > min_rhs
""",
        "mfd_violations_orders": """
WITH d AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS cluster_size,
         coalesce(max(o_totalprice) - min(o_totalprice), 0.0) AS diameter
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, cluster_size, diameter FROM d WHERE diameter > 50000.0
""",
        "cfd_metrics_orders": """
WITH sub AS (SELECT * FROM orders WHERE o_orderstatus = 'F'),
l1 AS (SELECT o_custkey, o_orderpriority, count(*) AS cnt
       FROM sub GROUP BY o_custkey, o_orderpriority),
l2 AS (SELECT o_custkey,
              CAST(sum(cnt) AS BIGINT) AS cluster_size,
              CAST(count(*) AS BIGINT) AS num_distinct_rhs,
              CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS eq_pairs2x
       FROM l1 GROUP BY o_custkey),
m AS (
  SELECT CAST(coalesce(sum(cluster_size), 0) AS BIGINT) AS support,
         CAST(coalesce(sum(CASE WHEN num_distinct_rhs > 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS num_violating_clusters,
         CAST(coalesce(sum(CASE WHEN num_distinct_rhs > 1 THEN cluster_size
                                ELSE 0 END), 0) AS BIGINT) AS num_violating_rows,
         CAST(coalesce(sum(cluster_size * (cluster_size - 1) - eq_pairs2x), 0)
              AS BIGINT) AS conflicts
  FROM l2),
e AS (SELECT support, num_violating_clusters, num_violating_rows,
             CASE WHEN support > 1
                  THEN CAST(conflicts AS DOUBLE)
                       / CAST(support * support - support AS DOUBLE)
                  ELSE 0.0 END AS error
      FROM m)
SELECT support, num_violating_clusters, num_violating_rows, error,
       1.0 - error AS confidence,
       CAST(CASE WHEN num_violating_clusters = 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM e
""",
        "dedup_exact_documents": """
SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS cnt,
       min(doc_id) AS min_id
FROM documents WHERE text IS NOT NULL
GROUP BY md5(text) HAVING count(*) > 1
""",
        "minhash_documents": _minhash_oracle(8),
        "simhash_documents": _simhash_oracle(),
        "token_counts_documents": f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INT)
         AS n_regex_tokens
FROM documents
""",
        "fingerprint_documents": f"""
WITH w AS (SELECT doc_id, {_TOKS} AS toks
           FROM documents WHERE text IS NOT NULL)
SELECT doc_id AS id,
       CASE WHEN len(toks) >= 5 THEN
         list_min(list_transform(range(1, len(toks) - 4 + 1),
                                 i -> md5(array_to_string(toks[i:i+4], ' '))))
       ELSE md5(array_to_string(toks, ' ')) END AS fingerprint
FROM w
""",
        "lang_id_documents": _lang_id_oracle(),
        "ann_topk_embeddings": """
WITH e AS (SELECT vec_id, embedding,
                  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                       i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
           FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 10),
p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(q.embedding) + 1),
                  i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
             / (CASE WHEN q.nrm * c.nrm > 0 THEN q.nrm * c.nrm ELSE 1.0 END)
               AS cosine
      FROM q, e c WHERE q.vec_id <> c.vec_id),
r AS (SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
      FROM p)
SELECT query_id, neighbor_id, cosine_r, rank FROM r WHERE rank <= 3
""",
        "ar_pair_rules_events": """
WITH t AS (SELECT DISTINCT user_id AS tid, event_type AS item
           FROM events WHERE event_type IS NOT NULL),
n AS (SELECT count(DISTINCT tid) AS n_tx FROM t),
items AS (SELECT item, count(*) AS af FROM t GROUP BY item),
pairs AS (SELECT a.item AS antecedent, b.item AS consequent, count(*) AS pf
          FROM t a JOIN t b ON a.tid = b.tid AND a.item <> b.item
          GROUP BY a.item, b.item)
SELECT p.antecedent, p.consequent,
       round(CAST(p.pf AS DOUBLE) / CAST(n.n_tx AS DOUBLE), 9) AS support_r,
       round(CAST(p.pf AS DOUBLE) / CAST(i.af AS DOUBLE), 9) AS confidence_r
FROM pairs p, n, items i
WHERE i.item = p.antecedent
  AND CAST(p.pf AS DOUBLE) / CAST(n.n_tx AS DOUBLE) >= 0.2
  AND CAST(p.pf AS DOUBLE) / CAST(i.af AS DOUBLE) >= 0.6
""",
        "ac_exceptions_lineitem": """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity <> 0
            THEN CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)
            END AS binop_value
FROM lineitem
WHERE l_quantity <> 0
  AND NOT (CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)
             BETWEEN 500.0 AND 1500.0)
""",
        "pfd_metrics_orders": """
WITH l1 AS (SELECT o_custkey, o_orderpriority, count(*) AS cnt
            FROM orders GROUP BY o_custkey, o_orderpriority),
l2 AS (SELECT o_custkey,
              CAST(sum(cnt) AS BIGINT) AS cluster_size,
              CAST(max(cnt) AS BIGINT) AS max_rhs_cnt
       FROM l1 GROUP BY o_custkey),
m AS (SELECT CAST(coalesce(sum(cluster_size), 0) AS BIGINT) AS total_rows,
             CAST(count(*) AS BIGINT) AS num_clusters,
             CAST(coalesce(sum(max_rhs_cnt), 0) AS BIGINT) AS keep
      FROM l2)
SELECT total_rows, num_clusters,
       CASE WHEN total_rows > 0
            THEN 1.0 - CAST(keep AS DOUBLE) / CAST(total_rows AS DOUBLE)
            ELSE 0.0 END AS error,
       CAST(CASE WHEN (CASE WHEN total_rows > 0
                       THEN 1.0 - CAST(keep AS DOUBLE) / CAST(total_rows AS DOUBLE)
                       ELSE 0.0 END) <= 0.3 THEN 1 ELSE 0 END AS INT) AS holds
FROM m
""",
        "fd_discovery_orders": _fd_minimal_oracle(),
        "fd_discovery_all_miners_orders": (
            "SELECT a.algorithm, f.lhs, f.rhs FROM ("
            + " UNION ALL ".join(
                f"SELECT '{n}' AS algorithm" for n in _FD_MINER_NAMES
            )
            + ") a CROSS JOIN (" + _fd_minimal_oracle() + ") f"
        ),
        "ucc_discovery_all_orders": (
            "SELECT a.algorithm, u.ucc FROM ("
            "SELECT 'tane' AS algorithm UNION ALL SELECT 'hyucc' AS algorithm"
            ") a CROSS JOIN (" + _ucc_minimal_oracle() + ") u"
        ),
        "afd_discovery_orders": _afd_discovery_oracle(0.3),
        "od_discovery_lineitem": _od_discovery_oracle(0),
        "ucc_discovery_orders": _ucc_minimal_oracle(),
        "ucc_discovery_hybrid_orders": _ucc_minimal_oracle(),
        "ind_discovery_tpch": _ind_discovery_oracle(),
        "ind_discovery_nary": _nary_ind_oracle(),
        "span_invariant_violations": _span_invariant_oracle(),
        "referential_media_catalog": _referential_staged_oracle(),
        "span_equality_docs": _span_equality_oracle(),
        "ann_topk_lsh_embeddings": _ann_lsh_oracle(planes=6, k=3),
        "ann_topk_ivf_embeddings": _ivf_oracle(k=3, n_centroids=16, nprobe=4),
        "embedding_near_dup": _near_dup_oracle(
            planes=4, threshold=0.3, max_bucket=1000
        ),
        "cfd_tableau_orders": _cfd_tableau_oracle(),
        "od_violations_lineitem_2col": """
WITH g AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         CAST(count(*) AS BIGINT) AS group_size,
         min(l_extendedprice) AS min_rhs,
         max(l_extendedprice) AS max_rhs
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
    AND l_extendedprice IS NOT NULL
  GROUP BY l_orderkey, l_linenumber, l_quantity),
w AS (
  SELECT *, max(max_rhs) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber ASC, l_quantity ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS prev_max_rhs
  FROM g)
SELECT l_orderkey, l_linenumber, l_quantity, group_size, min_rhs, prev_max_rhs
FROM w WHERE prev_max_rhs > min_rhs
""",
        "gfd_order_customer": """
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS total_matches,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS premise_matches,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F'
                            AND (c_mktsegment IS NULL
                                 OR c_mktsegment <> 'BUILDING')
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS num_violations
  FROM orders JOIN customer ON o_custkey = c_custkey)
SELECT total_matches, premise_matches, num_violations,
       CASE WHEN premise_matches > 0
            THEN CAST(num_violations AS DOUBLE)
                 / CAST(premise_matches AS DOUBLE)
            ELSE 0.0 END AS error,
       CAST(CASE WHEN num_violations = 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM m
""",
        "mfd_highlights_orders": """
WITH env AS (SELECT o_custkey, min(o_totalprice) AS lo, max(o_totalprice) AS hi
             FROM orders WHERE o_totalprice IS NOT NULL GROUP BY o_custkey),
e AS (SELECT * FROM env WHERE hi - lo > 50000.0),
v AS (SELECT DISTINCT o_custkey, o_totalprice AS point
      FROM orders WHERE o_totalprice IS NOT NULL),
p AS (SELECT e.o_custkey, v.point,
             CASE WHEN e.hi - v.point > v.point - e.lo THEN e.hi ELSE e.lo END
               AS furthest_point,
             greatest(e.hi - v.point, v.point - e.lo) AS max_distance
      FROM v JOIN e ON v.o_custkey = e.o_custkey),
r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY max_distance DESC, point ASC) AS rn
      FROM p)
SELECT o_custkey, point, furthest_point, max_distance,
       CAST(CASE WHEN max_distance > 50000.0 THEN 1 ELSE 0 END AS INT)
         AS exceeds
FROM r WHERE rn <= 100
""",
        "simhash_near_pairs": f"""
WITH f AS ({_simhash_oracle()}),
p AS (SELECT a.id AS id_a, b.id AS id_b,
             CAST(bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1))
                + bit_count(xor(a.sh2, b.sh2)) + bit_count(xor(a.sh3, b.sh3))
                AS INT) AS hamming
      FROM f a JOIN f b
        ON a.id < b.id
       AND (a.sh0 = b.sh0 OR a.sh1 = b.sh1 OR a.sh2 = b.sh2 OR a.sh3 = b.sh3))
SELECT id_a, id_b, hamming FROM p WHERE hamming <= 10
""",
        "dd_violations_supplier": """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       abs(CAST(a.s_nationkey AS DOUBLE) - CAST(b.s_nationkey AS DOUBLE))
         AS rhs_distance
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND abs(CAST(a.s_acctbal AS DOUBLE) - CAST(b.s_acctbal AS DOUBLE)) <= 100.0
WHERE NOT (abs(CAST(a.s_nationkey AS DOUBLE) - CAST(b.s_nationkey AS DOUBLE))
             BETWEEN 0.0 AND 5.0)
""",
        "cfd_discovery_orders": _cfd_discovery_oracle(),
        "od_discovery_auto_lineitem": _od_auto_oracle(),
        "dd_discovery_supplier": """
WITH p AS (
  SELECT abs(CAST(a.s_nationkey AS DOUBLE) - CAST(b.s_nationkey AS DOUBLE))
           AS d_nat,
         CAST(levenshtein(a.s_name, b.s_name) AS DOUBLE) AS d_name
  FROM supplier a JOIN supplier b
    ON a.s_suppkey < b.s_suppkey
   AND abs(CAST(a.s_acctbal AS DOUBLE) - CAST(b.s_acctbal AS DOUBLE)) <= 100.0),
m AS (SELECT CAST(count(*) AS BIGINT) AS num_pairs,
             min(d_nat) AS lo_nat, max(d_nat) AS hi_nat,
             min(d_name) AS lo_name, max(d_name) AS hi_name
      FROM p)
SELECT 's_nationkey' AS rhs_col, lo_nat AS lo, hi_nat AS hi, num_pairs,
       CAST(CASE WHEN num_pairs >= 1 AND lo_nat IS NOT NULL
            THEN 1 ELSE 0 END AS INT) AS holds
FROM m
UNION ALL
SELECT 's_name', lo_name, hi_name, num_pairs,
       CAST(CASE WHEN num_pairs >= 1 AND lo_name IS NOT NULL
            THEN 1 ELSE 0 END AS INT)
FROM m
""",
        "ind_discovery_nary_approx": _nary_ind_oracle(),
        "fd_discovery_hybrid_orders": _fd_minimal_oracle(),
        "aucc_discovery_orders": (
            "SELECT a.algorithm, u.aucc, u.error FROM ("
            "SELECT 'levelwise' AS algorithm"
            " UNION ALL SELECT 'pyro' AS algorithm"
            ") a CROSS JOIN (" + _aucc_discovery_oracle() + ") u"
        ),
        "afd_discovery_sampled_orders": _afd_discovery_oracle(0.3),
        "afd_discovery_pyro_orders": _afd_discovery_oracle(0.3),
        "fd_discovery_fdep_orders": _fd_minimal_oracle(),
        "fd_discovery_fun_orders": _fd_minimal_oracle(),
        "fd_discovery_dfd_orders": _fd_minimal_oracle(),
        "fd_discovery_fastfds_orders": _fd_minimal_oracle(),
        "fd_discovery_depminer_orders": _fd_minimal_oracle(),
        "fd_discovery_fdmine_orders": _fd_minimal_oracle(),
        "near_dup_minhash_documents": _near_dup_minhash_oracle(),
        "typo_candidates_cities": f"""
WITH counts AS (
  SELECT city, country AS value, CAST(count(*) AS BIGINT) AS cnt
  FROM read_parquet('{_TYPOS_PATH}/*.parquet') GROUP BY city, country
),
cl AS (SELECT city, sum(cnt) AS cluster_size, count(*) AS n_vals,
              max(cnt) AS maxc
       FROM counts GROUP BY city),
ranked AS (
  SELECT city, value, cnt,
         row_number() OVER (PARTITION BY city
                            ORDER BY cnt DESC, value ASC) AS rk
  FROM counts
),
maj AS (SELECT city, value AS majority_value FROM ranked WHERE rk = 1),
viol AS (SELECT city FROM cl
         WHERE n_vals > 1
           AND CAST(maxc AS DOUBLE) / CAST(cluster_size AS DOUBLE) >= 0.6e0)
SELECT r.city, m.majority_value, r.value AS candidate_value,
       CAST(r.cnt AS BIGINT) AS candidate_count,
       CAST(levenshtein(r.value, m.majority_value) AS INT) AS distance
FROM ranked r
JOIN maj m ON m.city = r.city
JOIN viol v ON v.city = r.city
WHERE r.rk > 1 AND levenshtein(r.value, m.majority_value) <= 2
""",
        "gfd_dot_directors": f"""
WITH v AS (SELECT * FROM read_parquet('{_DIRECTORS_V_PATH}/*.parquet')),
e AS (SELECT src, dst FROM read_parquet('{_DIRECTORS_E_PATH}/*.parquet')
      WHERE label = 'directed'),
sym AS (SELECT src AS s, dst AS d FROM e
        UNION SELECT dst AS s, src AS d FROM e),
m AS (SELECT p.celebrity AS cel, f.success AS suc
      FROM sym JOIN v p ON p.vertex_id = sym.s AND p.label = 'person'
               JOIN v f ON f.vertex_id = sym.d AND f.label = 'film'
      WHERE sym.s <> sym.d),
a AS (SELECT CAST(count(*) AS BIGINT) AS total_matches,
             CAST(coalesce(sum(CASE WHEN cel = 'high' THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS premise_matches,
             CAST(coalesce(sum(CASE WHEN cel = 'high'
                                AND (suc IS NULL OR suc <> 'high')
                               THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS num_violations
      FROM m)
SELECT total_matches, premise_matches, num_violations,
       CASE WHEN premise_matches > 0
            THEN CAST(num_violations AS DOUBLE)
                 / CAST(premise_matches AS DOUBLE)
            ELSE 0.0 END AS error,
       CAST(CASE WHEN num_violations = 0 THEN 1 ELSE 0 END AS INT) AS holds
FROM a
""",
        "typed_rank_mixedfmt": f"""
WITH src AS (SELECT * FROM read_parquet('{_MIXEDFMT_PATH}/*.parquet'))
SELECT rid,
  CAST(DENSE_RANK() OVER (ORDER BY
    (CASE WHEN num IS NULL OR num = 'NULL' OR num = '' THEN NULL
          ELSE CAST(num AS DOUBLE) END) ASC NULLS FIRST) AS INT) AS num,
  CAST(DENSE_RANK() OVER (ORDER BY
    (CASE WHEN big IS NULL OR big = 'NULL' OR big = '' THEN NULL
          ELSE big END) ASC NULLS FIRST) AS INT) AS big,
  CAST(DENSE_RANK() OVER (ORDER BY
    (CASE WHEN s IS NULL OR s = 'NULL' OR s = '' THEN NULL
          ELSE s END) ASC NULLS FIRST) AS INT) AS s,
  CAST(DENSE_RANK() OVER (ORDER BY
    (CASE WHEN d IS NULL OR d = 'NULL' OR d = '' THEN NULL
          ELSE CAST(translate(d, '/.', '--') AS DATE) END)
    ASC NULLS FIRST) AS INT) AS d
FROM src
""",
        "ind_discovery_aind_nulls": f"""
WITH src AS (SELECT * FROM read_parquet('{_AINDNULLS_PATH}/*.parquet')),
vals AS (
  SELECT DISTINCT 'aind.a' AS col_id, a AS v FROM src
  WHERE a IS NOT NULL AND a <> 'NULL'
  UNION ALL
  SELECT DISTINCT 'aind.b', b FROM src WHERE b IS NOT NULL AND b <> 'NULL'
  UNION ALL
  SELECT DISTINCT 'aind.c', c FROM src WHERE c IS NOT NULL AND c <> 'NULL'
),
nn AS (
  SELECT 'aind.a' AS col_id,
         CAST(SUM(CASE WHEN a IS NULL OR a = 'NULL' THEN 1 ELSE 0 END)
              AS DOUBLE) AS nulls FROM src
  UNION ALL
  SELECT 'aind.b',
         CAST(SUM(CASE WHEN b IS NULL OR b = 'NULL' THEN 1 ELSE 0 END)
              AS DOUBLE) FROM src
  UNION ALL
  SELECT 'aind.c',
         CAST(SUM(CASE WHEN c IS NULL OR c = 'NULL' THEN 1 ELSE 0 END)
              AS DOUBLE) FROM src
),
totals AS (SELECT col_id, CAST(COUNT(*) AS BIGINT) AS lhs_distinct
           FROM vals GROUP BY col_id),
ov AS (
  SELECT l.col_id AS lhs, r.col_id AS rhs, CAST(COUNT(*) AS BIGINT) AS overlap
  FROM vals l JOIN vals r ON l.v = r.v
  WHERE l.col_id <> r.col_id
  GROUP BY 1, 2
),
res AS (
  SELECT o.lhs, o.rhs, t.lhs_distinct, o.overlap,
         1.0 - CAST(o.overlap AS DOUBLE)
               / (CAST(t.lhs_distinct AS DOUBLE) + n.nulls) AS error
  FROM ov o
  JOIN totals t ON t.col_id = o.lhs
  JOIN nn n ON n.col_id = o.lhs)
SELECT lhs, rhs, lhs_distinct, overlap, error,
       CAST(CASE WHEN error <= 0.5e0 THEN 1 ELSE 0 END AS INT) AS holds
FROM res WHERE error <= 0.5e0
""",
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-partition uniqueness verdicts over the interleaved-doc
    table (north-rule core) — 16 partitions × verdict columns, plus the
    lineitem-PK check appended as a global row (sf0.001)."""
    from pyspark.sql import functions as F

    from desbordante_spark.operators.ucc import ucc_metrics_df
    from desbordante_spark.sources.interleaved import generate_documents

    docs = generate_documents(spark, 5_000)
    per_part = ucc_metrics_df(docs, ["doc_id"], by=["part_key"])
    li = _read(spark, "/root/testdata/sf0.001", "lineitem")
    global_row = ucc_metrics_df(li, ["l_orderkey", "l_linenumber"]).select(
        F.lit("lineitem_pk").alias("part_key"), "*"
    )
    return per_part.unionByName(global_row)
