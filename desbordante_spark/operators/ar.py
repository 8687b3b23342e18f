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

__all__ = ["transactions_from", "mine_association_rules", "frequent_itemsets"]


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
