"""DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
2023, arXiv:2302.03169) — select raw-corpus documents whose hashed n-gram
distribution matches a small TARGET corpus. A first-class training-data
operator alongside the dedup/quality/decontamination family:

1. featurize every document as a hashed bag of unigrams + bigrams over B
   buckets (the paper's hashed n-gram features);
2. fit two add-one-smoothed bucket multinomials — target ``p`` from the
   target corpus, source ``q`` from the raw corpus;
3. score each raw document with the importance log-weight
   ``log w(x) = Σ_b n_b(x) · (log p_b − log q_b)``;
4. resample without replacement via Gumbel top-k — rank by
   ``log w + Gumbel`` (the paper's sampling trick). The Gumbel draw here is
   HASH-DERIVED (md5 of the doc id → uniform → ``−ln(−ln u)``): a per-doc
   seeded RNG, so the selection is deterministic and oracle-reproducible —
   a reproducibility substitution, not a semantic change.

Scale shape: featurization is a map; each model is ONE map-side-combinable
hash aggregate down to B rows (B ≤ 10³) collected to a broadcast literal map
(the k-centroids precedent for bounded driver collects); scoring folds each
doc's bucket counts in b-ascending order (deterministic float order — the
q83 sorted-fold discipline, so results are partitioning-invariant); the
final top-k is a TakeOrderedAndProject (per-partition top-k + merge), never
a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def _bucket(gram, num_buckets: int):
    """Portable gram → bucket hash: md5 hex prefix as a long, mod B (the
    repo's md5 hash family — DuckDB twin: CAST('0x'||substr(md5,1,15) AS
    BIGINT) % B)."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long") % num_buckets


def hashed_ngram_buckets(
    df: DataFrame, text_col: str, id_col: str, num_buckets: int = 256
) -> DataFrame:
    """Per-document hashed uni+bigram bucket counts: (id, bucket, n).
    One shuffle on (id, bucket), map-side combinable."""
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda t: t != ""
    )
    # Spark's sequence(1, 0) DESCENDS — guard short docs before building the
    # bigram index range
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .select("id", _bucket(F.col("gram"), num_buckets).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bucket_log_ratios(
    target_buckets: DataFrame, source_buckets: DataFrame, num_buckets: int = 256
) -> list[tuple[int, float]]:
    """(bucket, log p_b − log q_b) for every bucket the SOURCE corpus
    touches (every scored doc's buckets are source buckets by construction),
    add-one smoothing over B. Two B-row aggregates + one driver collect of
    ≤ B rows; the logs are computed JVM-side (F.log) for oracle parity with
    DuckDB's ln."""
    t = target_buckets.groupBy("bucket").agg(F.sum("n").alias("tc"))
    s = source_buckets.groupBy("bucket").agg(F.sum("n").alias("sc"))
    tot_t = target_buckets.agg(F.sum("n")).collect()[0][0] or 0
    tot_s = source_buckets.agg(F.sum("n")).collect()[0][0] or 0
    ratio = (
        s.join(t, "bucket", "left")
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("tc"), F.lit(0)).cast("double") + 1.0)
                      / F.lit(float(tot_t + num_buckets)))
                - F.log((F.col("sc").cast("double") + 1.0)
                        / F.lit(float(tot_s + num_buckets)))
            ).alias("logr"),
        )
        .collect()
    )
    return [(r["bucket"], r["logr"]) for r in ratio]


def gumbel_key(id_col, logw):
    """log w + hash-derived Gumbel noise: u = md5-prefix(id)/2^52 ∈ (0,1),
    g = −ln(−ln u) — the paper's Gumbel top-k with a per-doc seeded draw."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 13), 16, 10).cast("double")
    u = h / F.lit(float(1 << 52))
    return logw + (-F.log(-F.log(u)))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 200,
    num_buckets: int = 256,
    slot_prefix: str = "dsir",
) -> DataFrame:
    """The full DSIR selection: returns the k raw documents with the highest
    Gumbel-perturbed importance weights, with ``logw`` and the sampling
    ``key`` attached (both the evidence and the draw are certified).
    ``slot_prefix`` namespaces the session-cache pins so two DSIR stages
    over different corpora (q164 raw docs vs q166's curated corpus) don't
    thrash each other's slots."""
    from .session_cache import keep_persisted  # noqa: PLC0415

    # the source bucket counts are consumed THREE times (the q-model sum,
    # the total-gram collect, and the per-doc scoring fold) and the target
    # counts twice — pin both so the gram explode + md5 bucketing (the
    # dominant per-row work) runs once per corpus, not per consumer
    src = keep_persisted(
        hashed_ngram_buckets(raw, text_col, id_col, num_buckets), f"{slot_prefix}_src"
    )
    tgt = keep_persisted(
        hashed_ngram_buckets(target, text_col, id_col, num_buckets), f"{slot_prefix}_tgt"
    )
    ratios = bucket_log_ratios(tgt, src, num_buckets)
    # empty source corpus (e.g. a fully-decontaminated upstream stage):
    # there are no buckets to look up — F.create_map() with zero args can't
    # type-infer, and any expression works since per_doc is empty too
    if ratios:
        rmap = F.create_map(*[F.lit(x) for b, r in ratios for x in (b, r)])
    else:
        rmap = F.create_map(F.lit(-1).cast("long"), F.lit(0.0))
    per_doc = src.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("bucket", "n"))).alias("_bs")
    )
    # b-ascending left fold: deterministic summation order under any
    # partitioning (collect_list order varies; the sort pins it)
    logw = F.aggregate(
        "_bs", F.lit(0.0), lambda acc, x: acc + x["n"].cast("double") * rmap[x["bucket"]]
    )
    scored = (
        raw.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(logw, F.lit(0.0)).alias("logw"),  # gram-less docs fold to 0
        )
        .withColumn("key", gumbel_key(F.col("id"), F.col("logw")))
    )
    # TakeOrderedAndProject: per-partition top-k + driver merge of k rows —
    # no global sort, no single-partition exchange
    return scored.orderBy(F.col("key").desc()).limit(k)


__all__ = [
    "bucket_log_ratios",
    "dsir_select",
    "gumbel_key",
    "hashed_ngram_buckets",
]
