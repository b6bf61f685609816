"""Sequence packing for LLM training batches.

Training pipelines lay documents head-to-tail and cut fixed-token-budget
sequences ("concat-then-chunk" packing, the scheme used by GPT-style
pretraining loaders). Exact greedy whole-document bin packing is inherently
sequential — each placement depends on the remainder of the previous one —
so the distributed formulation assigns every document to the sequence where
its first token lands: one prefix-sum window per stratum, no sequential
state, and a sequence overflows by at most one document tail (exactly what a
streaming packer produces when documents may split across sequence
boundaries).

Scale shape: one shuffle per stratum key (language, source shard, ...);
within a stratum the window is a sort — stratify so no single stratum holds
the whole corpus, same rule as every other partitioned window here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_by: list,
    budget: int,
    strata: list[str] | None = None,
    seq_col: str = "seq_id",
    offset_col: str = "start_offset",
) -> DataFrame:
    """Assign each row a packed-sequence id and its token start offset.

    ``seq_id`` = which ``budget``-sized window the row's first token falls
    in, counting tokens in ``order_by`` order within each stratum. Rows must
    carry a non-negative token count in ``token_col``.
    """
    keys = strata or []
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(offset_col, start).withColumn(
        seq_col, F.floor(F.col(offset_col) / F.lit(budget)).cast("long")
    )
