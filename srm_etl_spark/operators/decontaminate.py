"""Benchmark decontamination: n-gram overlap between a training corpus and an
evaluation/benchmark set.

The standard training-data hygiene step (n-gram collision decontamination, as
popularized by GPT-3/PaLM data cards): any training document sharing >= K
word n-grams with a benchmark document is flagged and dropped before
training. The reference repo has no such operator (it is an ETL for a civic
search index); this is part of the LLM-pipeline extension surface, built on
the same shingle kernel the dedup family uses
(functions/text.py:word_shingles, cf. operators/dedup.py).

Scale shape (100 TB corpus, benchmark sets ~1e5 docs):
- The eval side is *small by construction* — benchmarks are human-curated.
  Its distinct n-gram set (typically <= 1e7 strings) is broadcast, so the
  corpus-side explode never shuffles: shingle generation and the contamination
  probe both run map-side inside whole-stage codegen.
- The only shuffle carries (doc_id, matched-gram) rows — i.e. only the
  *collisions*, which for a clean corpus is a vanishing fraction of the data.
- Counting per doc is a map-side-combinable hash aggregate on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import word_shingles


def eval_ngrams(eval_df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-grams of the evaluation set: one column ``gram``."""
    return (
        eval_df.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Per-document contamination report for corpus docs that share at least
    ``min_overlap`` distinct word ``n``-grams with the eval set.

    Output: (id_col, matched_ngrams, total_ngrams, contamination_pct) —
    the drop-list (plus evidence) a curation pipeline acts on. Documents with
    no collisions never leave the mappers, so the result is proportional to
    the contamination, not the corpus.
    """
    grams = word_shingles(F.col(text_col), n)
    with_grams = corpus.select(
        F.col(id_col), F.size(grams).alias("total_ngrams"), grams.alias("_grams")
    )
    exploded = with_grams.select(
        id_col, "total_ngrams", F.explode("_grams").alias("gram")
    )
    ev = eval_ngrams(eval_df, text_col, n)
    matched = exploded.join(F.broadcast(ev), "gram")
    report = (
        matched.groupBy(id_col, "total_ngrams")
        # shingles are distinct within a doc, so a plain count is the
        # distinct-gram overlap — no count_distinct shuffle needed
        .agg(F.count(F.lit(1)).alias("matched_ngrams"))
        .filter(F.col("matched_ngrams") >= min_overlap)
    )
    return report.select(
        id_col,
        "matched_ngrams",
        "total_ngrams",
        F.round(
            F.col("matched_ngrams") * 100.0 / F.col("total_ngrams"), 4
        ).alias("contamination_pct"),
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """The corpus minus contaminated documents (left_anti on the report).

    The anti-join's right side is the report — already reduced to the
    contaminated id list, so it broadcasts in any realistic setting.
    """
    flagged = contamination_report(
        corpus, eval_df, text_col, id_col, n, min_overlap
    ).select(id_col)
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
