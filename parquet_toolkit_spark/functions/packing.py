"""Sequence packing for training-batch assembly.

Pretraining pipelines concatenate documents and cut the stream into
fixed token-budget sequences ("concat-then-chunk"; GPT-style packing).
This module computes that assignment declaratively: within each group
(e.g. a source shard or language), documents concatenate in a caller-
chosen deterministic order and a document belongs to the bin where its
FIRST token lands. Long documents (> budget) simply span bins — exactly
the stream semantics — and the formula needs no special case.

Scale: ONE window aggregation partitioned by the group columns — the
running token sum is computed per group in parallel, no global ordering
and no driver state. At 100 TB the group key (source shard / lang /
date) keeps every window partition bounded; packing across the whole
corpus in one global order would serialize — refuse it by requiring
group columns. All JVM-side Column arithmetic, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_greedy"]


def pack_greedy(df: DataFrame, group_cols: tuple[str, ...],
                order_col: str, token_col: str,
                budget: int) -> DataFrame:
    """Assign each row a pack bin: concatenate rows in `order_col` order
    within each `group_cols` group and cut the token stream every
    `budget` tokens; a row's bin is where its first token lands.

    Adds two columns: `pack_bin` (0-based per group) and `pack_offset`
    (the row's start offset inside its bin, in tokens).

    `order_col` must be unique within each group (a doc id): ties would
    make the running sum order nondeterministic across runs — the same
    discipline as any exactly-reproducible data layout.

    token_col values must be non-negative; budget >= 1.
    """
    if not group_cols:
        raise ValueError(
            "pack_greedy needs group columns: packing one global stream "
            "serializes into a single window partition at scale — group "
            "by a shard key (source, lang, date, ...)")
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    missing = [c for c in (*group_cols, order_col, token_col)
               if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in dataframe: {missing}")
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy(F.col(order_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # tokens strictly before this row in the group's stream; exact in
    # int64 (token sums are nowhere near 2^53, and the division below is
    # integer arithmetic both here and in the ANSI oracle)
    start = (F.sum(F.col(token_col)).over(w)
             - F.col(token_col)).cast("long")
    return (
        df.withColumn("pack_bin",
                      ((start - F.pmod(start, F.lit(budget)))
                       / F.lit(budget)).cast("long"))
        .withColumn("pack_offset", F.pmod(start, F.lit(budget)))
    )
