"""Association-rule mining (Apriori equivalent).

Reference (/root/reference/src/core/algorithms/association_rules/): canonical
hash-tree Apriori over ``TransactionalData`` with ``minsup``/``minconf``
options (apriori.h:15-46); input formats ``singular`` (tid,item rows) and
``tabular`` (row = transaction) (config/names.h:21-24,
model/transaction/transactional_data.h).

Spark-first: ``pyspark.ml.fpm.FPGrowth`` is the built-in, distributed,
superior replacement (FP-Growth beats Apriori's candidate generation at any
scale). This module maps the reference's input formats onto it and returns
rules with the reference's (support, confidence) surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["transactions_from", "mine_association_rules",
           "mine_association_rules_full", "frequent_itemsets"]


def transactions_from(
    df: DataFrame,
    input_format: str = "singular",
    tid_col: str = "tid",
    item_col: str = "item",
    item_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Build ``(tid, items array<string>)`` transactions.

    ``singular``: (tid, item) rows → ``groupBy(tid).collect_set(item)``.
    ``tabular``: each row is a transaction; ``item_cols`` (default: all
    non-tid columns) contribute their non-null values as items.

    Tabular input WITHOUT a ``tid_col`` gets surrogate ids from
    ``monotonically_increasing_id()`` — unique within a run but
    partition-layout dependent, so NOT stable across runs. Rule mining
    (``mine_association_rules``) never reads the tid; pass an explicit
    ``tid_col`` when transactions must be joined back to source rows.
    """
    if input_format == "singular":
        return (
            df.filter(F.col(item_col).isNotNull())
            .groupBy(F.col(tid_col).alias("tid"))
            .agg(F.array_distinct(F.collect_list(
                F.col(item_col).cast("string"))).alias("items"))
        )
    if input_format == "tabular":
        cols = list(item_cols) if item_cols else [
            c for c in df.columns if c != tid_col
        ]
        arr = F.array_distinct(
            F.filter(
                F.array(*[F.col(c).cast("string") for c in cols]),
                lambda x: x.isNotNull(),
            )
        )
        tid = (
            F.col(tid_col) if tid_col in df.columns
            else F.monotonically_increasing_id()
        )
        return df.select(tid.alias("tid"), arr.alias("items"))
    raise ValueError(f"unknown input_format {input_format!r}")


def frequent_itemsets(
    transactions: DataFrame, min_support: float = 0.1
) -> DataFrame:
    """Frequent itemsets ``(items, freq, support)`` via FPGrowth."""
    from pyspark.ml.fpm import FPGrowth

    n = transactions.count()
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=0.0
    ).fit(transactions)
    return model.freqItemsets.withColumn(
        "support", F.col("freq").cast("double") / F.lit(float(n))
    )


def mine_association_rules(
    transactions: DataFrame,
    min_support: float = 0.1,
    min_confidence: float = 0.5,
) -> DataFrame:
    """Association rules ``(antecedent, consequent, confidence, support,
    lift)`` — the reference's ``minsup``/``minconf`` thresholds applied by
    FPGrowth itself."""
    from pyspark.ml.fpm import FPGrowth

    model = FPGrowth(
        itemsCol="items",
        minSupport=min_support,
        minConfidence=min_confidence,
    ).fit(transactions)
    return model.associationRules


def mine_association_rules_full(
    transactions: DataFrame,
    min_support: float = 0.1,
    min_confidence: float = 0.5,
) -> DataFrame:
    """Association rules with FULL consequent enumeration — the reference's
    Apriori emits every rule ``A → Z∖A`` over every frequent itemset ``Z``
    and non-empty proper subset ``A`` (test_apriori.cpp goldens include
    2-item consequents like {Yogurt} → {Milk, Eggs}); Spark's FPGrowth
    ``associationRules`` only emits single-item consequents, so this
    derives the complete rule set from the frequent-itemset frame instead.

    Scale shape: the frequent list is small by construction (bounded by
    ``min_support``), so the antecedent⊆itemset pairing is a broadcast
    self-join of the frequent frame — no second data pass; confidence =
    freq(Z)/freq(A) needs no re-count. Output matches
    ``mine_association_rules``'s schema: ``(antecedent, consequent,
    confidence, support, lift)``."""
    freq = frequent_itemsets(transactions, min_support)
    a = freq.select(
        F.col("items").alias("antecedent"),
        F.col("freq").alias("a_freq"),
        F.col("support").alias("a_support"),
    )
    z = freq.select(
        F.col("items").alias("z_items"),
        F.col("freq").alias("z_freq"),
        F.col("support").alias("z_support"),
    )
    pairs = z.join(
        F.broadcast(a),
        (F.size("antecedent") < F.size("z_items"))
        & (F.size(F.array_except("antecedent", "z_items")) == 0),
    )
    conf = F.col("z_freq").cast("double") / F.col("a_freq").cast("double")
    cons = F.array_except("z_items", "antecedent")
    out = pairs.select(
        "antecedent",
        cons.alias("consequent"),
        conf.alias("confidence"),
        F.col("z_support").alias("support"),
    ).filter(F.col("confidence") >= F.lit(float(min_confidence)))
    # lift = confidence / support(consequent): join the consequent's own
    # frequency back from the frequent list (consequents of frequent
    # itemsets are themselves frequent — always present)
    c = freq.select(
        F.col("items").alias("c_items"),
        F.col("support").alias("c_support"),
    )
    return out.join(
        F.broadcast(c),
        (F.size(F.array_except(out["consequent"], c["c_items"])) == 0)
        & (F.size(c["c_items"]) == F.size(out["consequent"])),
    ).select(
        "antecedent",
        "consequent",
        "confidence",
        "support",
        (F.col("confidence") / F.col("c_support")).alias("lift"),
    )
