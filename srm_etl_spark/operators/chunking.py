"""Document chunking: overlapping token windows with stable chunk ids.

The RAG/embedding-prep primitive: long documents are split into fixed-size
token windows with a stride overlap so no passage is cut mid-context, and
each chunk carries a deterministic id derived from (doc id, window start) via
the engine's ``hasher`` (``srm_tools/hash.py:4-6`` semantics — the same id
kernel the reference uses for cards) so re-chunking is idempotent and
downstream embedding tables can be upserted incrementally.

Scale shape: pure per-row array math — one ``sequence`` of window starts per
document, one ``explode``; no shuffle at all. Output size is
``ceil(tokens/stride)`` rows per doc, each carrying only its own window's
text. The explode happens *after* tokenization, so the tokenizer runs once
per document, not once per chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import hasher
from ..functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Windows start at token 1, 1+stride, 1+2*stride, ... while the start lies
    inside the document; the final window may be shorter than
    ``chunk_tokens``. Token-less documents produce no chunks.

    Output columns: ``id_col``, chunk_id (hasher(doc id, start) — 8-hex,
    byte-compatible with the reference id kernel), chunk_index (0-based),
    chunk_start (1-based token offset), n_chunk_tokens, chunk_text.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.col("_n"), F.lit(1)), F.lit(stride))
    chunks = (
        toks.filter(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            "_n",
            F.posexplode(starts).alias("chunk_index", "chunk_start"),
        )
        .select(
            id_col,
            # single ':'-joined argument: hasher concatenates args with no
            # separator, so ("12","3") and ("1","23") would collide otherwise
            hasher(
                F.concat_ws(
                    ":",
                    F.col(id_col).cast("string"),
                    F.col("chunk_start").cast("string"),
                )
            ).alias("chunk_id"),
            F.col("chunk_index").cast("long").alias("chunk_index"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.least(
                F.lit(chunk_tokens), F.col("_n") - F.col("chunk_start") + 1
            ).cast("long").alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("chunk_start"), F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )
    return chunks
