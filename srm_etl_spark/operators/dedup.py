"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Generalizes the reference's bespoke dedup passes (``merge_duplicate_branches``
at ``operators/derive/to_dp.py:237-286``, the composite-key seen-set at
``:580-586``, the pandas groupby-dedup in ``operators/meser/__init__.py:116-131``)
into the scale-path operators an LLM-data pipeline needs.

Scale design notes (the part that matters at 100 TB):
- every operator is groupBy/join-shaped — partitioned by content key, no
  driver state, no collect;
- MinHash/LSH: candidate generation is an equi-join on (band, band_hash)
  buckets, so the shuffle is proportional to the number of (doc, band) pairs,
  not |docs|^2;
- SimHash: bucket on table prefixes of the fingerprint (block key) before
  comparing hamming distance within buckets;
- all pairwise comparisons happen only within blocks/buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text, word_shingles


# --- exact ------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", keep: str = "min"
) -> DataFrame:
    """Hash-groupBy exact dedup on normalized text.

    Keeps the row with the min (or max) id per content hash and annotates it
    with ``dup_count``. Deterministic — unlike ``dropDuplicates`` — so results
    are stable across cluster sizes and retries.
    """
    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    hashed = df.withColumn("_content_hash", F.sha1(normalized_text(F.col(text_col))))
    w = Window.partitionBy("_content_hash")
    ranked = hashed.withColumn("_rn", F.row_number().over(w.orderBy(order))).withColumn(
        "dup_count", F.count("*").over(w)
    )
    return ranked.filter(F.col("_rn") == 1).drop("_rn", "_content_hash")


# --- MinHash + LSH ----------------------------------------------------------

def exploded_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 3
) -> DataFrame:
    """(id, shingle) rows — one shingling pass, reused by signature and verify
    stages. Explicitly materialized as rows because projection collapsing
    would otherwise inline the (expensive) shingling expression into every
    consumer column."""
    return df.select(
        id_col, F.explode(word_shingles(F.col(text_col), shingle_k)).alias("shingle")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature over k-word shingles, as columns mh_0..n.

    Hash function #i is ``xxhash64(shingle, i)`` — mixing the index into the
    hash input gives independent orderings per slot (an affine a*h+b family
    with small coefficients would be order-preserving, collapsing every slot
    to the same min-shingle) and avoids ANSI-mode overflow.

    Shaped as explode → groupBy(min × num_hashes): the shingling runs ONCE per
    document (as column-level signature expressions it would be inlined — and
    recomputed — per hash column), and the mins partially aggregate map-side,
    so the shuffle carries num_hashes longs per document.
    """
    sh = exploded_shingles(df, text_col, id_col, shingle_k)
    return sh.groupBy(id_col).agg(
        *[F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh_{i}") for i in range(num_hashes)]
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.

    Returns distinct (left_id, right_id) with left < right. The band join is
    an equi-join on (band_index, band_hash) — shuffle-partitioned by bucket,
    never quadratic in the corpus.
    """
    rows_per_band = num_hashes // bands
    band_arrays = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
                    "band_hash"
                ),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(id_col, F.explode(band_arrays).alias("bb")).select(
        id_col, "bb.band", "bb.band_hash"
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("left_id"), F.col(f"r.{id_col}").alias("right_id"))
        .distinct()
    )
    return pairs


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
    shingle_k: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> exact-Jaccard
    verify on shingle sets -> survivors (min id per duplicate pair removed).

    Returns the deduplicated corpus (rows of `df` whose id is NOT dominated by
    a smaller-id near-duplicate).
    """
    sh_rows = exploded_shingles(df, text_col, id_col, shingle_k)
    sigs = sh_rows.groupBy(id_col).agg(
        *[F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh_{i}") for i in range(num_hashes)]
    )
    cands = minhash_lsh_candidates(sigs, id_col, num_hashes, bands)
    # Verify candidates with exact Jaccard; shingle sets come from the same
    # exploded rows (one shingling pass for the whole pipeline).
    shingled = sh_rows.groupBy(id_col).agg(F.collect_set("shingle").alias("sh"))
    verified = (
        cands.join(shingled.withColumnRenamed(id_col, "left_id").withColumnRenamed("sh", "sh_l"), "left_id")
        .join(shingled.withColumnRenamed(id_col, "right_id").withColumnRenamed("sh", "sh_r"), "right_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_l", "sh_r"))
            / F.size(F.array_union("sh_l", "sh_r")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    losers = verified.select(F.col("right_id").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# --- SimHash ----------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprints, fully native (no UDF).

    Each token votes its xxhash64 bits; the fingerprint's bit b is 1 when the
    weighted vote is positive. Shaped as explode → groupBy(doc) with one vote
    sum per bit: partial aggregation runs map-side and the shuffle carries
    `bits` longs per document — this scales linearly with corpus size, unlike
    a per-row nested higher-order expression (bit positions also can't be
    lambda variables: shiftright requires a literal shift amount).

    Token-less documents get fingerprint 0.
    """
    toks = F.filter(F.split(normalized_text(F.col(text_col)), " "), lambda t: t != "")
    exploded = df.select(
        id_col, F.explode_outer(toks).alias("_t")
    ).select(id_col, F.xxhash64("_t").alias("_h"))
    votes = [
        F.sum(
            F.when(F.col("_h").isNull(), -1)
            .when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    agg = exploded.groupBy(id_col).agg(*votes)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"_v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select(id_col, fp.alias("simhash"))


def simhash_near_dup_pairs(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Candidate pairs with hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into `blocks` segments;
    any pair within distance `max_hamming < blocks` must agree on >= 1 segment,
    so the join is an equi-join on (segment_index, segment_value) — linear
    shuffle, no cross join.
    """
    seg_bits = 64 // blocks
    mask = (1 << seg_bits) - 1
    segs = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg"),
                F.shiftright(F.col("simhash"), i * seg_bits).bitwiseAND(F.lit(mask)).alias("seg_val"),
            )
            for i in range(blocks)
        ]
    )
    blocked = fingerprints.select(id_col, "simhash", F.explode(segs).alias("s")).select(
        id_col, "simhash", "s.seg", "s.seg_val"
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.seg") == F.col("r.seg"),
                F.col("l.seg_val") == F.col("r.seg_val"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("left_id"),
            F.col(f"r.{id_col}").alias("right_id"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


# --- n-gram Jaccard ---------------------------------------------------------

def jaccard_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Token-set Jaccard similarity pairs within blocks, inverted-index style.

    Instead of a blocked pairwise join with per-pair array intersections
    (O(pairs × tokens) with heavy per-row allocation), candidate pairs are
    generated through an inverted index: explode distinct tokens, self-join on
    (block, token), count shared tokens per pair, then
    ``jaccard = shared / (|A| + |B| - shared)``. Pairs sharing zero tokens
    never materialize, the shuffle is keyed by token (partition-parallel), and
    per-pair work is a counter — the standard set-similarity-join shape that
    holds at corpus scale. With ``threshold > 0`` the zero-overlap pairs the
    pairwise formulation would score 0.0 are (identically) absent.
    """
    blocks = list(block_cols or [])
    toks = df.select(
        id_col,
        *blocks,
        F.explode(
            F.array_distinct(
                F.filter(F.split(normalized_text(F.col(text_col)), " "), lambda t: t != "")
            )
        ).alias("_tok"),
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    left, right = toks.alias("l"), toks.alias("r")
    conds = [F.col("l._tok") == F.col("r._tok"), F.col(f"l.{id_col}") < F.col(f"r.{id_col}")]
    for b in blocks:
        conds.append(F.col(f"l.{b}").eqNullSafe(F.col(f"r.{b}")))
    shared = (
        left.join(right, on=conds)
        .groupBy(
            F.col(f"l.{id_col}").alias("left_id"), F.col(f"r.{id_col}").alias("right_id")
        )
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    pairs = (
        shared.join(sizes.withColumnRenamed(id_col, "left_id").withColumnRenamed("_n", "_nl"), "left_id")
        .join(sizes.withColumnRenamed(id_col, "right_id").withColumnRenamed("_n", "_nr"), "right_id")
        .select(
            "left_id",
            "right_id",
            (F.col("_shared") / (F.col("_nl") + F.col("_nr") - F.col("_shared"))).alias("jaccard"),
        )
    )
    return pairs.filter(F.col("jaccard") >= threshold)


# --- embedding near-dup -----------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_expr=None,
) -> DataFrame:
    """Cosine-similarity near-duplicate pairs over an embedding column.

    `block_expr(df) -> Column` optionally assigns a coarse bucket (e.g. an LSH
    sign-bit prefix) so the self-join is per-bucket. Without it this is the
    exact O(n^2/block) baseline for tests.
    """
    from .similarity import cosine_similarity  # noqa: PLC0415

    base = df.select(id_col, vec_col)
    if block_expr is not None:
        base = base.withColumn("_blk", block_expr)
    l, r = base.alias("l"), base.alias("r")
    conds = [F.col(f"l.{id_col}") < F.col(f"r.{id_col}")]
    if block_expr is not None:
        conds.append(F.col("l._blk") == F.col("r._blk"))
    pairs = l.join(r, on=conds).select(
        F.col(f"l.{id_col}").alias("left_id"),
        F.col(f"r.{id_col}").alias("right_id"),
        cosine_similarity(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


# --- composite-key dedup (reference A8) -------------------------------------

def dedup_by_keys(df: DataFrame, keys: list[str], order_by: list | None = None) -> DataFrame:
    """Deterministic first-row-per-key dedup (reference seen-set filter,
    ``to_dp.py:580-586``): explicit ordering instead of stream order."""
    w = Window.partitionBy(*keys).orderBy(*(order_by or [F.col(k) for k in keys]))
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
