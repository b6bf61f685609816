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


def exact_substring_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 16,
    broadcast_eval_keys: bool | None = None,
) -> DataFrame:
    """ANY-length exact-substring decontamination (Lee et al. 2022 §6.2's
    "train-test leakage" variant of ExactSubstr, the surgical form of the
    GPT-3-style n-gram drop): every span of a TRAINING document that occurs
    verbatim (>= ``min_tokens`` tokens) anywhere in the eval set is CUT OUT
    of the document, instead of dropping the whole document.

    The position cover is EXACT for any-length shared substrings with only
    fixed-length windows: a shared substring of m >= L tokens shares all its
    L-windows, and any position under a shared L-window is inside a shared
    >= L substring — so marking train windows whose key occurs in the eval
    window set and coalescing marked starts (gap <= L) covers exactly the
    union of all shared >= L substrings. (No prefix-extension machinery
    needed cross-corpus — unlike ``dedup.maximal_repeat_spans``, which also
    reports exact per-repeat lengths.)

    Output: one row per training document — (id_col, n_contam_spans,
    contam_tokens, clean_text). Uncontaminated docs pass through verbatim
    with zero counts.

    Scale shape: the eval window-key set is usually small (benchmarks are
    human-curated) and then broadcast — the corpus-side window stream never
    shuffles for the probe; the only shuffle is the span coalescing window
    over MARKED rows (proportional to the leakage, not the corpus) plus the
    span join back (broadcast: spans are tiny). The cut itself is the
    ``dedup.remove_duplicate_spans`` per-row array kernel.

    ``broadcast_eval_keys`` controls the probe join strategy: the key set
    grows with eval TOKEN count (one md5 per position), so a large eval
    side — q170 feeds 1/7 of the corpus as "eval" — can outgrow the
    driver/executor broadcast budget. Default ``None`` decides from
    ``spark.sql.autoBroadcastJoinThreshold`` vs. the estimated key bytes
    (a count of the distinct keys × the 44-byte md5 row — one extra
    bounded aggregate over the eval side only); ``True``/``False`` force
    the hint on/off, and off means a plain shuffle equi-join (AQE may
    still pick broadcast if the built side turns out small).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from ..functions.text import tokens  # noqa: PLC0415
    from .dedup import remove_duplicate_spans  # noqa: PLC0415

    def _windows(df: DataFrame, with_id: bool) -> DataFrame:
        toks = tokens(F.col(text_col))
        base = (
            df.select(F.col(id_col), toks.alias("_t"))
            .withColumn("_n", F.size("_t"))
            .filter(F.col("_n") >= min_tokens)
        )
        wins = base.select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.col("_n") - (min_tokens - 1))
            ).alias("s"),
            "_t",
        ).select(
            id_col,
            "s",
            F.md5(
                F.array_join(F.slice(F.col("_t"), F.col("s"), min_tokens), " ")
            ).alias("_k"),
        )
        return wins if with_id else wins.select("_k").distinct()

    ev_keys = _windows(eval_df, with_id=False)
    if broadcast_eval_keys is None:
        # one shuffle-free aggregate over the EVAL side only (never the
        # corpus): total window count upper-bounds the distinct key count,
        # ~44 bytes per md5 row vs. the session broadcast budget
        from ..session import parse_byte_size  # noqa: PLC0415

        # sessions outside get_spark render the default as '10485760b', and
        # users set unit forms like '10MB' — never bare int() a size conf
        thresh = parse_byte_size(
            corpus.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            ),
            default=10 << 20,
        )
        n_keys_ub = (
            eval_df.select(
                F.greatest(
                    F.size(tokens(F.col(text_col))) - (min_tokens - 1), F.lit(0)
                ).alias("_w")
            )
            .agg(F.sum("_w").alias("n"))
            .collect()[0]["n"]
            or 0
        )
        broadcast_eval_keys = thresh > 0 and n_keys_ub * 44 <= thresh
    if broadcast_eval_keys:
        ev_keys = F.broadcast(ev_keys)
    marked = _windows(corpus, with_id=True).join(ev_keys, "_k").select(id_col, "s")
    w = Window.partitionBy(id_col).orderBy("s")
    brk = F.when(F.col("s") - F.lag("s").over(w) > min_tokens, 1).otherwise(0)
    island = F.sum("_brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        marked.withColumn("_brk", brk)
        .withColumn("_isl", island)
        .groupBy(id_col, "_isl")
        .agg(
            F.min("s").alias("span_start"),
            (F.max("s") + F.lit(min_tokens - 1)).alias("span_end"),
        )
    )
    cleaned = remove_duplicate_spans(corpus, spans, text_col, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_contam_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("contam_tokens"),
    )
    return (
        cleaned.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contam_spans", F.lit(0)).alias("n_contam_spans"),
            F.coalesce("contam_tokens", F.lit(0)).alias("contam_tokens"),
            "clean_text",
        )
    )
