"""CCNet-shaped corpus curation (Wenzek et al. 2019, arXiv:1911.00359).

The CCNet pipeline is the canonical web-corpus recipe the reference-scale
training-data stacks (cc_net, RedPajama, FineWeb ancestors) all derive from:

1. **paragraph-level exact dedup across the whole corpus** — every document
   is cut into paragraphs, each paragraph is hashed, and all-but-one copy of
   every duplicated paragraph is dropped corpus-wide (cc_net dedup step);
2. **language identification** on the deduplicated text (fastText there, the
   engine's script+stopword vote here — q24's operator);
3. **per-language LM perplexity scoring** (one KenLM per language there, the
   engine's corpus-trained add-one bigram model here — q125's operator) and
   bucketing into **head / middle / tail** terciles of the per-language score
   distribution.

This corpus has no newlines (TESTDATA.md), so the paragraph unit is the
fixed 10-token window q71 established — here TAIL-INCLUSIVE (ceil(n/10)
windows) because CCNet's unit covers all text; nothing may be silently
dropped before dedup.

Scale shape, stage by stage:

- dedup is ONE shuffle keyed by the paragraph text (at open-corpus scale the
  key would be ``xxhash64(paragraph)`` — 8-byte keys — kept as text here so
  the DuckDB oracle can replay it); the keeper is the min (doc_id, pos)
  occurrence — deterministic under any partitioning;
- reassembly is one hash aggregate per doc (collect kept windows, sort by
  position — per-doc arrays, never a global sort);
- lang-ID and LM scoring are per-row expressions plus the bigram count
  tables (map-side combinable, cardinality ≤ vocab² per language);
- bucketing uses **score-threshold semantics, not per-doc ranks**: the
  head/middle/tail boundaries are computed on the per-(lang, score)
  distribution table — bounded by the 4-decimal score grid × |languages|,
  i.e. genuinely broadcastable at any corpus size — and joined back
  broadcast. No full-corpus global sort anywhere; equal scores land in the
  same bucket (exactly CCNet's percentile-threshold behavior, where a rank
  formulation would need an arbitrary tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import bigram_logprob_scores, normalized_text, tokens, with_lang_id

PARAGRAPH_TOKENS = 10


def paragraph_dedup(docs: DataFrame, chunk: int = PARAGRAPH_TOKENS) -> DataFrame:
    """Corpus-wide exact paragraph dedup + document reassembly.

    Returns one row per SURVIVING document (≥1 kept paragraph):
    ``doc_id, n_chunks, n_kept, kept_text`` where kept_text is the document
    re-joined from its surviving windows in position order.
    """
    toks = docs.select("doc_id", tokens(normalized_text(F.col("text"))).alias("_t"))
    # tail-INCLUSIVE windows: ceil(size/chunk) of them; slice() clamps the
    # last one. sequence(0, -1) DESCENDS in Spark, so the empty-doc case
    # needs an explicit empty array.
    occ = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"if(size(_t) >= 1, "
                f"transform(sequence(0, ((size(_t) + {chunk - 1}) div {chunk}) - 1), "
                f"i -> array_join(slice(_t, i * {chunk} + 1, {chunk}), ' ')), "
                "array())"
            )
        ).alias("pos", "chunk"),
    )
    # ONE shuffle on the paragraph key: the canonical copy is the smallest
    # (doc_id, pos) occurrence — partitioning-invariant.
    keeper = F.min(F.struct("doc_id", "pos")).over(Window.partitionBy("chunk"))
    flagged = occ.withColumn(
        "_kept",
        F.when(
            (keeper["doc_id"] == F.col("doc_id")) & (keeper["pos"] == F.col("pos")),
            F.struct("pos", "chunk"),
        ),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        # collect_list skips the NULLs the keeper test left behind
        F.array_sort(F.collect_list("_kept")).alias("_kept_arr"),
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        F.size("_kept_arr").alias("n_kept"),
        F.array_join(F.transform("_kept_arr", lambda x: x["chunk"]), " ").alias(
            "kept_text"
        ),
    ).filter(F.col("n_kept") >= 1)


def perplexity_buckets(
    scored: DataFrame, lang_col: str = "lang_pred", score_col: str = "avg_logprob"
) -> DataFrame:
    """head/middle/tail per-language tercile buckets by score THRESHOLDS.

    A document is *head* when fewer than ceil(n/3) documents of its language
    score strictly higher (higher mean log-prob = lower perplexity),
    *middle* below ceil(2n/3), else *tail* — with no ties this is exactly
    rank ≤ ceil(n/3), and tied scores share a bucket (CCNet cuts on
    percentile thresholds of the score distribution, not per-doc ranks).
    The boundary computation runs entirely on the (lang, score) distribution
    table — bounded by the 4-decimal score grid — then joins back broadcast.
    """
    dist = scored.groupBy(lang_col, score_col).agg(F.count(F.lit(1)).alias("c"))
    w_gt = (
        Window.partitionBy(lang_col)
        .orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(lang_col)
    cum = dist.select(
        lang_col,
        score_col,
        F.coalesce(F.sum("c").over(w_gt), F.lit(0)).alias("c_gt"),
        F.sum("c").over(w_all).alias("n"),
    )
    # integer ceil: c_gt < ceil(n/3) <=> c_gt < (n+2) div 3 for integer c_gt;
    # expressed via div to stay integer-exact in both engines
    bucket = (
        F.when(F.col("c_gt") < F.expr("(n + 2) div 3"), F.lit("head"))
        .when(F.col("c_gt") < F.expr("(2 * n + 2) div 3"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    thresholds = cum.select(lang_col, score_col, bucket.alias("bucket"))
    return scored.join(F.broadcast(thresholds), [lang_col, score_col])


def ccnet_buckets(
    docs: DataFrame, chunk: int = PARAGRAPH_TOKENS, persist: bool = True
) -> DataFrame:
    """The full CCNet composition: paragraph dedup → lang-ID → per-language
    bigram-LM scoring → head/middle/tail buckets. One row per document that
    survives dedup with ≥2 kept tokens (the LM needs one bigram; CCNet
    likewise scores only what still has text).

    ``persist=False`` skips the session pins (scaling probes: a pinned
    intermediate turns the second warm rep into a cache scan and flattens
    the scale signal — see tools/scaling_probe.py)."""
    from ..operators.session_cache import keep_persisted  # noqa: PLC0415

    def pin(df, slot):
        return keep_persisted(df, slot) if persist else df

    alive = paragraph_dedup(docs, chunk)
    langed = with_lang_id(alive, "kept_text").select(
        "doc_id", "n_chunks", "n_kept", "kept_text", "lang_pred"
    )
    # FOUR consumers (LM pairs, LM vocab, the per-lang V join's source, and
    # the final n_chunks/n_kept join) — unpinned, every branch re-runs the
    # dedup shuffle and the lang-ID regexes. Post-dedup it is corpus-sized
    # but projected to (ids, counters, kept text): one session-slot persist.
    langed = pin(langed, "ccnet_langed")
    scored = bigram_logprob_scores(
        langed, text_col="kept_text", id_col="doc_id", group_col="lang_pred"
    )
    # TWO consumers inside perplexity_buckets (the (lang, score) distribution
    # aggregate AND the threshold join-back) — unpinned, the whole bigram-LM
    # subtree runs twice. Post-score it is one slim row per document.
    scored = pin(scored, "ccnet_scored")
    out = perplexity_buckets(scored).join(
        langed.select("doc_id", "n_chunks", "n_kept"), "doc_id"
    )
    return out.select(
        "doc_id",
        "lang_pred",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        "avg_logprob",
        "bucket",
    )
