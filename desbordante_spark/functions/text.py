"""Text-analysis column functions for training-data pipelines.

All pure JVM column expressions (built-in ``pyspark.sql.functions`` only —
no UDFs) so they run inside whole-stage codegen at full scan speed:

- ``token_count`` — whitespace tokens and a BPE-ish regex token count.
- ``lang_id`` — n-gram/stopword-ratio heuristic over a small per-language
  stopword table plus a CJK-codepoint check.
- ``quality_features`` / ``quality_score`` — length, punctuation/digit/symbol
  ratios, stopword ratio, mean word length → composite [0,1] score.
- ``doc_fingerprint`` — deterministic document fingerprint: min-md5 over
  rolling word 5-grams (robust to small edits near the ends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.sources.readers import spread_small_input

__all__ = [
    "tokens",
    "token_count",
    "regex_token_count",
    "lang_id",
    "lang_id_table",
    "quality_features",
    "quality_score",
    "doc_fingerprint",
]

# compact, public-knowledge stopword shortlists (top function words)
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "it", "for",
           "on", "with", "as", "was", "at", "by", "be", "this", "are", "or"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "ist", "mit",
           "nicht", "ein", "eine", "auf", "für", "im", "dem", "sich", "des"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "du", "que",
           "est", "pour", "dans", "qui", "au", "pas", "sur", "ne", "se"],
    "es": ["el", "la", "los", "las", "de", "y", "que", "en", "un", "una",
           "es", "del", "se", "por", "con", "no", "para", "su", "al"],
}


def tokens(col) -> F.Column:
    """Whitespace token array of a text column (empty array for blank)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")


def token_count(col) -> F.Column:
    return F.size(tokens(col))


def regex_token_count(col, pattern: str = r"\w+|[^\w\s]") -> F.Column:
    """BPE-ish token count: word pieces plus standalone punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def _stopword_hits(text: F.Column, lang: str) -> F.Column:
    # compiled regex alternation (JVM, one pass over the string) instead of
    # a higher-order filter + array_contains per token — HOF lambdas are
    # interpreted (no whole-stage codegen) and measured ~100x slower here
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(1)))


def _stopword_ratio(text: F.Column, toks: F.Column, lang: str) -> F.Column:
    n = F.size(toks)
    hits = _stopword_hits(text, lang)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(0.0)


def lang_id(col) -> F.Column:
    """Heuristic language id ∈ {en,de,fr,es,zh,unknown}.

    CJK codepoints → zh; else the language whose stopword-hit ratio is
    highest (ties broken in a fixed language order); all-zero → unknown.
    """
    c = F.col(col) if isinstance(col, str) else col
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    # argmax over raw HIT COUNTS (the per-language ratios share the token
    # denominator, so the argmax is identical) via one array_max over
    # (hits, priority, lang) structs: each regex evaluates exactly ONCE and
    # no tokenization is needed at all. A when-chain argmax duplicates every
    # prior subexpression (no CSE) — measured 20x slower.
    prio = {"en": 4, "de": 3, "fr": 2, "es": 1}  # fixed priority on ties
    scores = F.array(*[
        F.struct(
            _stopword_hits(c, lang).alias("h"),
            F.lit(p).alias("p"),
            F.lit(lang).alias("lang"),
        )
        for lang, p in prio.items()
    ])
    best = F.array_max(scores)
    return (
        F.when(c.isNull() | (F.trim(c) == ""), F.lit("unknown"))
        .when(cjk * 2 >= F.length(c), F.lit("zh"))
        .when(best["h"] <= 0, F.lit("unknown"))
        .otherwise(best["lang"])
    )


def lang_id_table(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Corpus-scale language id: ``(id, pred_lang)``.

    The scalar ``lang_id`` pays Java-regex alternation per row (~100µs+ on
    long texts). This operator is the 100 TB path: explode tokens once,
    broadcast-join the (word, lang) stopword dimension, aggregate hit counts
    per doc — all codegen'd, one shuffle keyed by doc id. Token-equality
    semantics (a stopword glued to punctuation does not count; identical to
    the regex \\b semantics on whitespace-clean text).
    """
    spark = df.sparkSession
    sw_rows = [(w, lang) for lang, ws in STOPWORDS.items() for w in ws]
    sw = spark.createDataFrame(sw_rows, "word string, lang string")
    prio = {"en": 4, "de": 3, "fr": 2, "es": 1}
    c = F.col(col)
    # no input spread here (measured): unlike the md5/n-gram operators the
    # per-row scan work is light, so an extra exchange costs more than the
    # serial scan it parallelizes — the broadcast-dim join + hit aggregation
    # already dominate and parallelize after their own shuffle
    base = df.select(
        F.col(id_col).alias("id"),
        c.alias("_text"),
        F.length(F.regexp_replace(c, r"[^一-鿿]", "")).alias("_cjk"),
        F.length(c).alias("_len"),
        (c.isNull() | (F.trim(c) == "")).alias("_blank"),
    )
    toks = base.select(
        "id", F.explode(tokens(F.col("_text"))).alias("tok")
    ).select("id", F.lower("tok").alias("word"))
    hits = (
        toks.join(F.broadcast(sw), "word")
        .groupBy("id")
        .agg(*[
            F.sum((F.col("lang") == lang).cast("long")).alias(f"h_{lang}")
            for lang in prio
        ])
    )
    j = base.join(hits, "id", "left").na.fill(0, [f"h_{m}" for m in prio])
    best = F.array_max(F.array(*[
        F.struct(F.col(f"h_{lang}").alias("h"), F.lit(p).alias("p"),
                 F.lit(lang).alias("lang"))
        for lang, p in prio.items()
    ]))
    pred = (
        F.when(F.col("_blank"), F.lit("unknown"))
        .when(2 * F.col("_cjk") >= F.col("_len"), F.lit("zh"))
        .when(best["h"] <= 0, F.lit("unknown"))
        .otherwise(best["lang"])
    )
    return j.select(F.col("id"), pred.alias("pred_lang"))


def quality_features(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Per-doc quality feature row: ``(id, n_chars, n_tokens, mean_word_len,
    punct_ratio, digit_ratio, alpha_ratio, stopword_ratio_en, upper_ratio)``.
    Ratios are exact integer fractions."""
    src = spread_small_input(
        df.filter(F.col(col).isNotNull()).select(
            F.col(id_col).alias(id_col), F.col(col).alias(col)
        )
    )
    c = F.col(col)
    toks = tokens(c)
    n_chars = F.length(c)
    nz = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    n_of = lambda pat: F.length(F.regexp_replace(c, pat, ""))
    return src.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(
            F.size(toks) > 0,
            F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)).cast("double")
            / F.size(toks).cast("double"),
        ).otherwise(0.0).alias("mean_word_len"),
        (n_of(r"[^\.,;:!\?'\"()\[\]-]").cast("double") / nz).alias("punct_ratio"),
        (n_of(r"[^0-9]").cast("double") / nz).alias("digit_ratio"),
        (n_of(r"[^A-Za-z]").cast("double") / nz).alias("alpha_ratio"),
        _stopword_ratio(c, toks, "en").alias("stopword_ratio_en"),
        (n_of(r"[^A-Z]").cast("double") / nz).alias("upper_ratio"),
    )


def quality_score(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Composite [0,1] quality score from the feature row: rewards
    reasonable length and alpha density, penalizes digit/punct/upper excess.
    Thresholds are heuristic (documented, deterministic)."""
    f = quality_features(df, col, id_col)
    len_score = F.least(F.col("n_tokens").cast("double") / 20.0, F.lit(1.0))
    alpha_score = F.col("alpha_ratio")
    digit_pen = F.least(F.col("digit_ratio") * 4.0, F.lit(1.0))
    punct_pen = F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))
    upper_pen = F.least(F.col("upper_ratio") * 2.0, F.lit(1.0))
    score = (
        0.4 * len_score + 0.4 * alpha_score
        + 0.2 * (1.0 - (digit_pen + punct_pen + upper_pen) / 3.0)
    )
    return f.withColumn("quality", F.round(score, 6))


def doc_fingerprint(df: DataFrame, col: str, id_col: str,
                    window_words: int = 5) -> DataFrame:
    """Deterministic doc fingerprint ``(id, fingerprint)``: lexicographic min
    of md5 over rolling word n-grams (n = ``window_words``); whole-text md5
    when shorter."""
    c = F.col(col)
    n = window_words
    # materialize the token array once per row in its OWN projection: a
    # higher-order transform re-evaluates every subtree under its lambda per
    # element, so an inline split() re-tokenizes the whole document for each
    # gram position — O(T^2) per doc. Bound to an attribute it is evaluated
    # once (CollapseProject keeps the projection: the alias is non-cheap and
    # referenced more than once). md5 is fused into the same transform so
    # the gram strings are never materialized as a second array.
    base = spread_small_input(
        df.filter(c.isNotNull()).select(F.col(id_col).alias("id"), c.alias("_t"))
    ).select("id", tokens(F.col("_t")).alias("_toks"))
    toks = F.col("_toks")
    fp = F.when(
        F.size(toks) >= n,
        F.array_min(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
            )
        ),
    ).otherwise(F.md5(F.concat_ws(" ", toks)))
    return base.select("id", fp.alias("fingerprint"))
