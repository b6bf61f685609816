"""Round-4 extension queries, part 5: composed end-to-end pipelines.

q95 — RAG retrieval end-to-end: chunk → deterministic hash-embedding →
      exact top-k over chunks. Composes operators/chunking.py with the
      similarity family; runs the md5 feature family so the whole pipeline
      (chunk windows, per-token features, fold, cosine ranking) is
      DuckDB-oracle-checkable; the xxhash64 default family stays
      pytest-pinned (self-retrieval and determinism).
q96 — the q87 mixing table EXECUTED: per-source quotas from the
      temperature weights, filled by deterministic md5-order sampling —
      the materialization step between "decide the mix" and "train on it".
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.chunking import chunk_documents
from ..operators.similarity import brute_force_topk
from ._scalar import scalarized_sql, stringify_arrays
from .queries import _NORM, QueryDef, _t

_NORM_Q100 = _NORM.format(c='text')


def _pylist(sf_dir: str, table: str, cols: list[str], key: str, limit: int | None = None):
    """Driver-side fixture slice: pyarrow read → sort by key → optional cap.
    Shared by every parity query that feeds a driver-side connector."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    rows = sorted(
        pq.read_table(f"{sf_dir}/{table}.parquet", columns=cols).to_pylist(),
        key=lambda r: r[key],
    )
    return rows[:limit] if limit is not None else rows


_EMBED_DIM = 32  # random-projection noise ~1/sqrt(dim); 32 keeps overlap >> noise


def hash_embedding(text_col, dim: int = _EMBED_DIM, hash_family: str = "xxhash64"):
    """Deterministic pseudo-embedding: a bag-of-tokens random projection —
    component i is the sum over tokens of a zero-mean seeded hash
    feature in [-1, 1) (pmod — a signed % would bias every feature by -1). The stand-in for a real encoder (not in this container) with
    the property retrieval plumbing actually needs: texts sharing tokens
    get correlated vectors (overlapping chunks ARE near neighbors),
    disjoint texts are near-orthogonal. Pure codegen, no Python; the token
    array is let-bound so the split runs once, not ``dim`` times.

    ``hash_family='md5'``: feature i of token t is carved from 4 hex chars of
    ``md5(t || ':' || i//8)`` (8 features per digest, so only ``dim/8`` md5
    evaluations per token) — a SQL oracle engine computes the identical
    vector. The fold runs token-major (one feature-vector per token,
    zip_with-summed in token order), giving bit-identical double sums to the
    oracle's per-dimension in-order reduce."""
    from ..functions.expr import let as _let  # noqa: PLC0415

    def build(toks):
        if hash_family == "md5":
            def tok_vec(t):
                def feat(i: int):
                    grp, off = divmod(i, 8)
                    val = F.conv(
                        F.substring(
                            F.md5(F.concat_ws(":", t, F.lit(str(grp)))),
                            off * 4 + 1,
                            4,
                        ),
                        16,
                        10,
                    ).cast("long")
                    return F.pmod(val, F.lit(1000)).cast("double") / 500.0 - 1.0

                return F.array(*[feat(i) for i in range(dim)])

            return F.aggregate(
                F.transform(toks, tok_vec),
                F.array_repeat(F.lit(0.0), dim),
                lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
            )

        def feat(i: int):
            return F.aggregate(
                toks,
                F.lit(0.0),
                lambda acc, t: acc
                + (F.pmod(F.xxhash64(t, F.lit(i)), F.lit(1000)).cast("double") / 500.0 - 1.0),
            )

        return F.array(*[feat(i) for i in range(dim)])

    return _let(F.split(text_col, " "), build)


# --------------------------------------------------------------------------
# q95 — RAG retrieval: chunk → embed → top-k
# --------------------------------------------------------------------------

def q95_rag_retrieval(spark, sf_dir):
    """Retrieval pipeline over the chunked corpus: 32-token windows (stride
    24), hash-embedded (md5 feature family → oracle-checkable), exact cosine
    top-3 per query chunk (queries = the first chunk of the 5 lowest
    doc_ids). All stages are per-row codegen until the final
    broadcast-queries × streamed-chunks ranking — the q29 shape over the
    chunk table. Chunks are keyed by ``doc_id:chunk_start`` (the sha1-based
    ``chunk_id`` stays the production key; the oracle engine lacks sha1)."""
    d = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(d, chunk_tokens=32, stride=24).select(
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("chunk_start").cast("string")
        ).alias("chunk_key"),
        "doc_id",
        "chunk_start",
        hash_embedding(F.col("chunk_text"), hash_family="md5").alias("embedding"),
    )
    queries = chunks.filter((F.col("doc_id") < 5) & (F.col("chunk_start") == 1))
    out = brute_force_topk(
        chunks, queries, k=3, vec_col="embedding", id_col="chunk_key"
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


Q95_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS t
  FROM documents
), st AS (
  SELECT doc_id, t, unnest(generate_series(1, greatest(len(t), 1), 24)) AS cs
  FROM toks WHERE len(t) > 0
), chunks AS (
  SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(cs AS VARCHAR) AS chunk_key,
         doc_id, cs AS chunk_start,
         list_slice(t, cs, cs + 31) AS ct
  FROM st
), emb AS (
  -- feature i of token t: 4 hex chars of md5(t || ':' || i//8) -> [-1, 1);
  -- per-dimension sum folds in token order (matches the Spark zip_with fold)
  SELECT chunk_key, doc_id, chunk_start,
         list_transform(generate_series(0, 31), i ->
           list_reduce(list_transform(ct, tok ->
             (CAST('0x' || substr(md5(tok || ':' || CAST(i // 8 AS VARCHAR)),
                                  (i % 8) * 4 + 1, 4) AS BIGINT) % 1000) / 500.0 - 1.0),
             (a, b) -> a + b)) AS v
  FROM chunks
), q AS (
  SELECT chunk_key AS query_id, v AS qv FROM emb WHERE doc_id < 5 AND chunk_start = 1
), scored AS (
  SELECT q.query_id, e.chunk_key AS neighbor_id,
         list_cosine_similarity(e.v, q.qv) AS cos_raw
  FROM emb e CROSS JOIN q WHERE e.chunk_key != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# q96 — execute the temperature mix as a deterministic sample
# --------------------------------------------------------------------------

_Q96_TARGET = 200


def q96_mixed_sample(spark, sf_dir):
    """Materialize the q87 mixing decision: per-source quota = round(
    temp_share * 200) docs, filled in md5(doc_id) order (deterministic
    "random", repartition-stable — the q68 discipline). One window per
    source stratum; the quota table is a broadcast of <=20 rows."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.sum(token_count(F.col("text"))).alias("tokens"))
    pw = F.pow(F.col("tokens").cast("double"), F.lit(0.7))
    totals = per.agg(F.sum(pw).alias("_t7"))
    quota = (
        per.crossJoin(F.broadcast(totals))
        .select(
            "source",
            F.round(pw / F.col("_t7") * _Q96_TARGET, 0).cast("long").alias("quota"),
        )
    )
    ordered = d.select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("_r")
    )
    w = Window.partitionBy("source").orderBy(F.asc("_r"), F.asc("doc_id"))
    ranked = ordered.withColumn("pick", F.row_number().over(w))
    out = ranked.join(F.broadcast(quota), "source").filter(
        F.col("pick") <= F.col("quota")
    )
    return out.select(
        "source",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("pick").cast("long").alias("pick"),
        F.col("quota").cast("long").alias("quota"),
    )


Q96_SQL = f"""
WITH per AS (
  SELECT source,
         sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                  ELSE len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')) END) AS tokens
  FROM documents GROUP BY source
),
quota AS (
  SELECT source,
         CAST(round(pow(CAST(tokens AS DOUBLE), 0.7)
                    / sum(pow(CAST(tokens AS DOUBLE), 0.7)) OVER () * {_Q96_TARGET}, 0) AS BIGINT) AS quota
  FROM per
),
ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick
  FROM documents
)
SELECT r.source, CAST(r.doc_id AS BIGINT) AS doc_id,
       CAST(r.pick AS BIGINT) AS pick, q.quota
FROM ranked r JOIN quota q USING (source)
WHERE r.pick <= q.quota
"""


EXT10_REGISTRY = {
    "q95_rag_retrieval": QueryDef(
        q95_rag_retrieval, Q95_SQL, "LLM-pipeline: composed RAG chunk→embed→top-k"
    ),
    "q96_mixed_sample": QueryDef(
        q96_mixed_sample, Q96_SQL, "LLM-pipeline: executed temperature mix sample"
    ),
}


# --------------------------------------------------------------------------
# q97 — multimodal audio round-trip (encode → sniff → Arrow-batched decode)
# --------------------------------------------------------------------------

def q97_audio_features(spark, sf_dir):
    """Audio-column plumbing end-to-end with a REAL codec (the q54
    discipline): synthesize an actual RIFF/WAVE PCM16 payload per document
    (constant amplitude ``amp * 128``), sniff the RIFF container from magic
    bytes (JVM-side hex), then parse fmt/data chunks back to
    sample-rate/duration/rms through mapInPandas
    (operators/multimodal.py:decode_audio_features). The oracle states every
    feature in closed form, INCLUDING the byte size (44-byte canonical
    header + 2 bytes per sample) — a hash match proves a real encode→decode
    round trip."""
    from ..operators.multimodal import (  # noqa: PLC0415
        attach_media_metadata,
        decode_audio_features,
        wav_const_expr,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 3 + 1) * 8000).cast("int").alias("sr"),
        ((F.col("n_chars") % 500 + 1) * 16).cast("int").alias("n"),
        (F.col("doc_id") % 256).cast("int").alias("amp"),
    )
    # The encode leg is fully JVM-native (hex-domain WAV assembly +
    # unhex, byte-equal to make_wav — test-pinned); only the decode leg,
    # the thing the query actually verifies, crosses into Python.
    # One narrow exchange spreads the single-file fixture scan across
    # cores so the Arrow decode stage parallelizes (a many-split
    # production scan makes it a no-op).
    d = d.repartition(min(8, spark.sparkContext.defaultParallelism))
    media = attach_media_metadata(
        d.withColumn("media", wav_const_expr(F.col("sr"), F.col("n"), F.col("amp"))),
        "media",
    )
    feats = decode_audio_features(
        media, "media", passthrough=["doc_id", "media_size_bytes", "media_format"]
    )
    return feats.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "sample_rate",
        F.col("n_samples").cast("long").alias("n_samples"),
        F.round("duration_s", 9).alias("duration_s"),
        F.round("rms", 9).alias("rms"),
        "media_size_bytes",
        "media_format",
    )


Q97_SQL = """
SELECT doc_id,
       CAST((doc_id % 3 + 1) * 8000 AS INTEGER) AS sample_rate,
       CAST((n_chars % 500 + 1) * 16 AS BIGINT) AS n_samples,
       round(CAST((n_chars % 500 + 1) * 16 AS DOUBLE)
             / ((doc_id % 3 + 1) * 8000), 9) AS duration_s,
       round(CAST(doc_id % 256 AS DOUBLE) * 128 / 32768.0, 9) AS rms,
       CAST(44 + 2 * (n_chars % 500 + 1) * 16 AS BIGINT) AS media_size_bytes,
       'riff' AS media_format
FROM documents
"""

EXT10_REGISTRY["q97_audio_features"] = QueryDef(
    q97_audio_features, Q97_SQL, "multimodal audio decode round-trip"
)


# --------------------------------------------------------------------------
# q98 — geocode flow with a deterministic resolver, oracle-checked
# --------------------------------------------------------------------------

def q98_geocode(spark, sf_dir):
    """The geocode pipeline end-to-end (operators/geocode.py: unresolved
    selection → distinct-keyword dedup → bounded-concurrency mapInPandas
    resolve → join-back + status rules), driven by a closed-form injectable
    resolver so the whole flow — including the NOT_FOUND marking the r3
    advisory fixed — is oracle-checkable. Keys whose last two digits are
    ≡ 0 (mod 10) miss (NOT_FOUND); the rest resolve to values derived only
    from those digits, which the SQL twin recomputes."""
    from ..operators.geocode import geocode_locations  # noqa: PLC0415

    c = _t(spark, sf_dir, "customer")
    locs = c.select(
        F.concat(F.lit("addr "), F.col("c_name")).alias("id"),
        F.lit(None).cast("string").alias("alternate_address"),
        F.lit("ACTIVE").alias("status"),
        F.lit(None).cast("double").alias("resolved_lat"),
        F.lit(None).cast("double").alias("resolved_lon"),
        F.lit(None).cast("string").alias("resolved_city"),
    )

    def resolver(kw: str):
        d2 = int(kw[-2:])
        if d2 % 10 == 0:
            return None
        return {
            "accuracy": "ROOFTOP",
            "provider": "fake",
            "resolved_address": kw.upper(),
            "resolved_lat": 29.5 + d2 * 0.01,
            "resolved_lon": 34.0 + (d2 % 10) * 0.1,
            "resolved_city": f"CITY_{d2 % 7}",
        }

    out = geocode_locations(locs, resolver)
    return out.select(
        "id",
        "status",
        "accuracy",
        "provider",
        "resolved_address",
        F.round("resolved_lat", 6).alias("resolved_lat"),
        F.round("resolved_lon", 6).alias("resolved_lon"),
        "resolved_city",
    )


Q98_SQL = """
WITH r AS (
  SELECT 'addr ' || c_name AS id,
         CAST(substr('addr ' || c_name, length('addr ' || c_name) - 1, 2) AS INT) AS d2
  FROM customer
)
SELECT id,
  CASE WHEN d2 % 10 = 0 THEN 'NOT_FOUND' ELSE 'VALID' END AS status,
  CASE WHEN d2 % 10 = 0 THEN NULL ELSE 'ROOFTOP' END AS accuracy,
  CASE WHEN d2 % 10 = 0 THEN NULL ELSE 'fake' END AS provider,
  CASE WHEN d2 % 10 = 0 THEN NULL ELSE upper(id) END AS resolved_address,
  CASE WHEN d2 % 10 = 0 THEN NULL
       ELSE round(29.5 + d2 * CAST(0.01 AS DOUBLE), 6) END AS resolved_lat,
  CASE WHEN d2 % 10 = 0 THEN NULL
       ELSE round(34.0 + (d2 % 10) * CAST(0.1 AS DOUBLE), 6) END AS resolved_lon,
  CASE WHEN d2 % 10 = 0 THEN NULL ELSE 'CITY_' || CAST(d2 % 7 AS VARCHAR) END AS resolved_city
FROM r
"""

EXT10_REGISTRY["q98_geocode"] = QueryDef(
    q98_geocode, Q98_SQL, "geocode flow §7.1-7 (S-ext) with injected resolver"
)


# --------------------------------------------------------------------------
# q99 — connector-protocol parity: three pagers, one truth
# --------------------------------------------------------------------------

def q99_connector_parity(spark, sf_dir):
    """The three ingestion pager protocols (S5/S6/S8: skip-limit, keyset
    cursor with monotonicity asserts, link-following) each replay the
    supplier dimension through a deterministic in-memory API — page sizes
    chosen to exercise short-final-page, cursor-advance and next-link
    termination — and must all land the exact table content. Pagers are
    driver-side by nature (so is the reference's scraping); the dimension
    tables they ingest are driver-small by the same design."""
    from ..sources.connectors import (  # noqa: PLC0415
        keyset_paged_to_df,
        linked_pager_to_df,
        paged_to_df,
    )

    rows = _pylist(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"], "s_suppkey")

    def fetch_page(skip, limit):
        return rows[skip : skip + limit]

    def fetch_after(cursor):
        after = [r for r in rows if cursor is None or r["s_suppkey"] > cursor]
        return after[:37]

    def fetch_url(url):
        i = int(url.split(":")[1])
        batch = rows[i * 53 : (i + 1) * 53]
        return {
            "records": batch,
            "next": f"page:{i + 1}" if len(batch) == 53 else None,
        }

    a = paged_to_df(spark, fetch_page, page_size=41)
    b = keyset_paged_to_df(spark, fetch_after, key_of=lambda r: r["s_suppkey"])
    c = linked_pager_to_df(spark, fetch_url, "page:0")
    out = (
        a.withColumn("protocol", F.lit("skip_limit"))
        .unionByName(b.withColumn("protocol", F.lit("keyset")))
        .unionByName(c.withColumn("protocol", F.lit("linked")))
    )
    return out.select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_name",
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        "protocol",
    )


Q99_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(s_nationkey AS BIGINT) AS s_nationkey, p.protocol
FROM supplier
CROSS JOIN (VALUES ('skip_limit'), ('keyset'), ('linked')) p(protocol)
"""

EXT10_REGISTRY["q99_connector_parity"] = QueryDef(
    q99_connector_parity, Q99_SQL, "S5 S6 S8 pager-protocol parity"
)


# --------------------------------------------------------------------------
# q100 — curation pipeline v2: dedup → decontaminate → quota, audited
# --------------------------------------------------------------------------

def q100_curation_v2(spark, sf_dir):
    """The round-4 curation stack composed end-to-end with an audited stage
    funnel (the q78 discipline over the NEW operators): exact dedup (min-id
    keeper) → benchmark decontamination (≥2 trigram collisions with the
    doc_id%37 eval slice — eval members drop themselves, as a real
    decontamination pass would) → per-(source, lang) quality quota (top 15).
    Output: one row per stage with its surviving doc count — the funnel a
    data-governance review signs off on."""
    from ..operators.decontaminate import contamination_report  # noqa: PLC0415
    from ..operators.dedup import exact_dedup  # noqa: PLC0415

    d = _t(spark, sf_dir, "documents")
    s1 = exact_dedup(d, "text", "doc_id")
    ev = s1.filter(F.col("doc_id") % 37 == 0)
    # Single-pass funnel: the four stage counts are exact identities over ONE
    # aggregation of the dedup output, instead of four aggregates whose
    # lineages re-run the funnel prefix (raw scanned 4x, dedup windowed 3x):
    #   raw            = sum(dup_count) over keepers (exact_dedup annotates
    #                    each keeper with its content-hash group size)
    #   deduped        = count(keepers)
    #   decontaminated = deduped - |drop-list|   (decontaminate() is a
    #                    left_anti of s1 against the report, whose ids are a
    #                    subset of s1 by construction)
    #   quota          = sum over (source, lang) of min(15, survivors):
    #                    top_k_per_group ranks with row_number() <= k, so its
    #                    per-group cardinality is min(k, n) regardless of the
    #                    quality ordering — the score need not be computed to
    #                    count the survivors.
    flagged = contamination_report(s1, ev, "text", "doc_id", n=3, min_overlap=2)
    marked = s1.join(
        F.broadcast(flagged.select("doc_id").withColumn("_hit", F.lit(1))),
        "doc_id",
        "left",
    )
    per_group = marked.groupBy("source", "lang").agg(
        F.sum("dup_count").alias("_raw"),
        F.count(F.lit(1)).alias("_s1"),
        F.count(F.when(F.col("_hit").isNull(), 1)).alias("_s2"),
    )
    totals = per_group.agg(
        F.coalesce(F.sum("_raw"), F.lit(0)).alias("raw"),
        F.coalesce(F.sum("_s1"), F.lit(0)).alias("deduped"),
        F.coalesce(F.sum("_s2"), F.lit(0)).alias("decontaminated"),
        F.coalesce(F.sum(F.least(F.lit(15), F.col("_s2"))), F.lit(0)).alias("quota"),
    )
    stages = ["raw", "deduped", "decontaminated", "quota"]
    return totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("stage"),
                        F.col(name).cast("long").alias("n_docs"),
                    )
                    for name in stages
                ]
            )
        ).alias("_r")
    ).select("_r.stage", "_r.n_docs")


Q100_SQL = """
WITH s1 AS (
  SELECT d.* FROM documents d JOIN (
    SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (PARTITION BY norm ORDER BY doc_id ASC) AS rn
      FROM (SELECT doc_id, __NORM__ AS norm FROM documents)
    ) WHERE rn = 1
  ) k USING (doc_id)
),
toks AS (
  SELECT doc_id, list_filter(string_split(__NORM__, ' '), t -> t != '') AS t
  FROM s1
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     generate_series(1, greatest(len(t) - 2, 1)),
                     i -> array_to_string(list_slice(t, i, i + 2), ' '))) END AS g
  FROM toks
),
ev AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 37 = 0),
hits AS (
  SELECT doc_id FROM (SELECT doc_id, unnest(g) AS gram FROM grams) c
  JOIN ev USING (gram) GROUP BY doc_id HAVING count(*) >= 2
),
s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
q AS (
  SELECT doc_id, source, lang,
    round((
      least(CAST(len(toks2) AS DOUBLE) / 50, 1.0)
      + 1.0 - least(CASE WHEN nonspace = 0 THEN 0.0
                         ELSE CAST(n_punct AS DOUBLE) / nonspace END * 4, 1.0)
      + CASE WHEN len(toks2) = 0 THEN 0.0
             ELSE CASE WHEN CAST(list_sum(list_transform(toks2, t -> length(t))) AS DOUBLE) / len(toks2)
                            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END END
    ) / 3.0, 4) AS quality
  FROM (
    SELECT doc_id, source, lang,
           list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks2,
           length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
           length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS n_punct
    FROM s2
  )
),
s3 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source, lang ORDER BY quality DESC, doc_id) AS rank
    FROM q
  ) WHERE rank <= 15
)
SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM documents
UNION ALL SELECT 'deduped', CAST(count(*) AS BIGINT) FROM s1
UNION ALL SELECT 'decontaminated', CAST(count(*) AS BIGINT) FROM s2
UNION ALL SELECT 'quota', CAST(count(*) AS BIGINT) FROM s3
""".replace("__NORM__", _NORM_Q100)

EXT10_REGISTRY["q100_curation_v2"] = QueryDef(
    q100_curation_v2, Q100_SQL, "LLM-pipeline: curation funnel v2 (dedup→decontam→quota)"
)


# --------------------------------------------------------------------------
# q101 — snapshot diff: the CDC view between two table versions
# --------------------------------------------------------------------------

def q101_snapshot_diff(spark, sf_dir):
    """operators/snapshot_diff.py over two constructed versions of the
    orders table: the old snapshot is missing the %13 slice (→ added),
    carries +1.0 stale totalprices on the %7 slice (→ changed) and has a
    synthetic %17 slice with shifted keys absent from the new snapshot
    (→ removed). One PK-keyed full-outer join comparing a content hash; the
    oracle derives the verdicts from the construction rules directly."""
    from ..operators.snapshot_diff import snapshot_diff  # noqa: PLC0415

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    real_old = o.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    synthetic = (
        o.filter((F.col("o_orderkey") % 13 != 0) & (F.col("o_orderkey") % 17 == 0))
        .withColumn("o_orderkey", F.col("o_orderkey") + 1000000000)
    )
    old = real_old.unionByName(synthetic)
    out = snapshot_diff(old, o, "o_orderkey", ["o_orderstatus", "o_totalprice"])
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"), "change"
    )


Q101_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, 'added' AS change
FROM orders WHERE o_orderkey % 13 = 0
UNION ALL
SELECT CAST(o_orderkey AS BIGINT), 'changed'
FROM orders WHERE o_orderkey % 13 != 0 AND o_orderkey % 7 = 0
UNION ALL
SELECT CAST(o_orderkey + 1000000000 AS BIGINT), 'removed'
FROM orders WHERE o_orderkey % 13 != 0 AND o_orderkey % 17 = 0
"""

EXT10_REGISTRY["q101_snapshot_diff"] = QueryDef(
    q101_snapshot_diff, Q101_SQL, "K6-ext snapshot CDC diff (update_table:28-52)"
)


# --------------------------------------------------------------------------
# q102 — taxonomy YAML flatten (S13) oracle-checked
# --------------------------------------------------------------------------

def q102_taxonomy_flatten(spark, sf_dir):
    """S13 end-to-end: a two-level openeligibility-style tree (regions →
    nations, built deterministically from the dimension tables) flattened
    into colon-joined ids + name breadcrumbs by the driver-side recursion
    (sources/connectors.py:flatten_taxonomy — the tree is catalog-small by
    nature, exactly like the reference's YAML). The oracle rebuilds the
    same rows relationally."""
    from ..sources.connectors import taxonomy_to_df  # noqa: PLC0415

    regions = _pylist(sf_dir, "region", ["r_regionkey", "r_name"], "r_regionkey")
    nations = _pylist(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"], "n_nationkey"
    )
    tree = [
        {
            "slug": r["r_name"].strip().lower(),
            "name": r["r_name"].strip(),
            "items": [
                {
                    "slug": n["n_name"].strip().lower(),
                    "name": n["n_name"].strip(),
                    "synonyms": [n["n_name"].strip()],
                }
                for n in nations
                if n["n_regionkey"] == r["r_regionkey"]
            ],
        }
        for r in regions
    ]
    return stringify_arrays(taxonomy_to_df(spark, tree))


Q102_SQL = """
SELECT trim(lower(r_name)) AS id, trim(r_name) AS name, trim(r_name) AS name_en,
       CAST([] AS VARCHAR[]) AS synonyms, '' AS breadcrumbs
FROM region
UNION ALL
SELECT trim(lower(r_name)) || ':' || trim(lower(n_name)) AS id,
       trim(n_name) AS name, trim(n_name) AS name_en,
       [trim(n_name)] AS synonyms, trim(r_name) AS breadcrumbs
FROM nation JOIN region ON n_regionkey = r_regionkey
"""

Q102_SQL = scalarized_sql(Q102_SQL, ["synonyms"])

EXT10_REGISTRY["q102_taxonomy_flatten"] = QueryDef(
    q102_taxonomy_flatten, Q102_SQL, "S13 taxonomy YAML flatten parity"
)


# --------------------------------------------------------------------------
# q103 — HTML table scrape (S11) oracle-checked
# --------------------------------------------------------------------------

def q103_html_scrape(spark, sf_dir):
    """S11 end-to-end: the part dimension's first 200 rows rendered as a
    static HTML table and scraped back through
    sources/connectors.py:html_table_to_df (pandas read_html with the
    regex fallback) — the oracle reads the same slice relationally, so a
    hash match proves the scrape is lossless including numeric re-typing."""
    from ..sources.connectors import html_table_to_df  # noqa: PLC0415

    rows = _pylist(sf_dir, "part", ["p_partkey", "p_name", "p_brand"], "p_partkey", 200)
    body = "".join(
        f"<tr><td>{r['p_partkey']}</td><td>{r['p_name']}</td><td>{r['p_brand']}</td></tr>"
        for r in rows
    )
    html = (
        "<html><body><table><tr><th>p_partkey</th><th>p_name</th><th>p_brand</th></tr>"
        + body
        + "</table></body></html>"
    )
    df = html_table_to_df(spark, html)
    return df.select(
        F.col("p_partkey").cast("long").alias("p_partkey"), "p_name", "p_brand"
    )


Q103_SQL = """
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, p_brand
FROM part ORDER BY p_partkey LIMIT 200
"""

EXT10_REGISTRY["q103_html_scrape"] = QueryDef(
    q103_html_scrape, Q103_SQL, "S11 HTML table scrape parity"
)


# --------------------------------------------------------------------------
# q104 — spreadsheet ingest (S4): headers on row 2 + duplicate-header dedup
# --------------------------------------------------------------------------

def q104_spreadsheet_ingest(spark, sf_dir):
    """S4 end-to-end: the customer slice exported as a CSV "sheet" with a
    tool banner on row 1, headers on row 2 and a DUPLICATE header name —
    ingested through sources/connectors.py:spreadsheet_to_df (headers_row=2,
    dedup_headers) exactly like the reference's Google-Sheet exports
    (manual_data_entry/external.py:28-33). The oracle reads the same slice
    relationally under the deduplicated names."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    from ..session import scratch_dir  # noqa: PLC0415

    from ..sources.connectors import spreadsheet_to_df  # noqa: PLC0415

    rows = _pylist(
        sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"], "c_custkey", 300
    )
    tmp = scratch_dir("srm_q104")
    try:
        path = os.path.join(tmp, "sheet.csv")
        with open(path, "w") as f:
            f.write("exported,by,tool\n")
            f.write("c_custkey,val,val\n")
            for r in rows:
                f.write(f"{r['c_custkey']},{r['c_name']},{r['c_mktsegment']}\n")
        # spreadsheet_to_df materializes through pandas (not a lazy file
        # read), so the temp dir can be removed as soon as it returns
        df = spreadsheet_to_df(spark, path, headers_row=2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return df.select(
        F.col("c_custkey").cast("long").alias("c_custkey"), "val", "val_2"
    )


Q104_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name AS val, c_mktsegment AS val_2
FROM customer ORDER BY c_custkey LIMIT 300
"""

EXT10_REGISTRY["q104_spreadsheet_ingest"] = QueryDef(
    q104_spreadsheet_ingest, Q104_SQL, "S4 spreadsheet ingest (headers=2, dedup) parity"
)


# --------------------------------------------------------------------------
# q105 — sitemap chunking (K8) oracle-checked
# --------------------------------------------------------------------------

def q105_sitemap(spark, sf_dir):
    """K8 end-to-end: customer URLs chunked into ≤100-per-file sitemap XML
    documents (sinks/files.py:sitemap_documents — the reference's 50k cap
    scaled to the fixture). The oracle rebuilds each file's exact XML string
    with an ordered string_agg, so the hash match pins chunk assignment,
    per-file URL ordering and the XML envelope byte-for-byte."""
    from ..sinks.files import sitemap_documents  # noqa: PLC0415

    c = _t(spark, sf_dir, "customer")
    urls = c.select(
        F.concat(F.lit("https://example.org/c/"), F.col("c_custkey")).alias("url")
    )
    out = sitemap_documents(urls, urls_per_file=100)
    return out.select(
        F.col("file_index").cast("long").alias("file_index"),
        "xml",
        F.col("n_urls").cast("long").alias("n_urls"),
    )


Q105_SQL = """
WITH u AS (
  SELECT 'https://example.org/c/' || CAST(c_custkey AS VARCHAR) AS url FROM customer
),
i AS (
  SELECT url,
         CAST(floor((row_number() OVER (ORDER BY url) - 1) / 100.0) AS BIGINT) AS file_index
  FROM u
)
SELECT file_index,
       '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
       || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' || chr(10)
       || string_agg('<url><loc>' || url || '</loc></url>', chr(10) ORDER BY url) || chr(10)
       || '</urlset>' AS xml,
       CAST(count(*) AS BIGINT) AS n_urls
FROM i GROUP BY file_index
"""

EXT10_REGISTRY["q105_sitemap"] = QueryDef(
    q105_sitemap, Q105_SQL, "K8 sitemap chunking parity (to_sitemap:41-95)"
)


# --------------------------------------------------------------------------
# q106 — enum map with raise (F27) + data envelope roundtrip (F28)
# --------------------------------------------------------------------------

_PRIORITY_HE = {
    "1-URGENT": "דחוף",
    "2-HIGH": "גבוה",
    "3-MEDIUM": "בינוני",
    "4-NOT SPECIFIED": "לא צוין",
    "5-LOW": "נמוך",
}


def q106_enum_envelope(spark, sf_dir):
    """F27 + F28 composed: order priorities map through a strict literal
    enum (unknown vocabulary raises — the reference's fail-fast assert,
    operators/entities/__init__.py:396-520) and the mapped row rides a
    pack/unpack data-envelope roundtrip (srm_tools/processors.py:20-50) —
    the oracle is the plain CASE mapping, so a hash match proves both the
    mapping and that the envelope is lossless."""
    from ..operators.relational import enum_map, pack_data, unpack_data  # noqa: PLC0415

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    mapped = o.withColumn(
        "priority_he", enum_map(F.col("o_orderpriority"), _PRIORITY_HE, strict=True)
    )
    packed = pack_data(mapped, ["o_orderpriority", "priority_he"])
    out = unpack_data(packed)
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderpriority",
        "priority_he",
    )


Q106_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
       CASE o_orderpriority
         WHEN '1-URGENT' THEN 'דחוף'
         WHEN '2-HIGH' THEN 'גבוה'
         WHEN '3-MEDIUM' THEN 'בינוני'
         WHEN '4-NOT SPECIFIED' THEN 'לא צוין'
         WHEN '5-LOW' THEN 'נמוך'
       END AS priority_he
FROM orders
"""

EXT10_REGISTRY["q106_enum_envelope"] = QueryDef(
    q106_enum_envelope, Q106_SQL, "F27 enum map w/ raise + F28 data envelope"
)


# --------------------------------------------------------------------------
# q107 — urls → structs (F2)
# --------------------------------------------------------------------------

def q107_urls_parse(spark, sf_dir):
    """F2: ``href#title`` lines → url entries (reference helpers.py:23-29 —
    rsplit on the LAST '#', default title for bare hrefs). Synthesized
    two-line inputs per customer exercise both branches; entries are
    exploded to plain columns so the oracle compares values, not struct
    renderings."""
    from ..functions.cleaning import transform_urls  # noqa: PLC0415

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    raw = F.concat(
        F.lit("https://site.example/c/"), F.col("c_custkey"),
        F.lit("#Home page\nhttps://alt.example/c/"), F.col("c_custkey"),
    )
    parsed = c.withColumn("entry", F.explode(transform_urls(raw)))
    return parsed.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("entry.href").alias("href"),
        F.col("entry.title").alias("title"),
    )


Q107_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       'https://site.example/c/' || CAST(c_custkey AS VARCHAR) AS href,
       'Home page' AS title
FROM customer
UNION ALL
SELECT CAST(c_custkey AS BIGINT),
       'https://alt.example/c/' || CAST(c_custkey AS VARCHAR),
       'קישור'
FROM customer
"""

EXT10_REGISTRY["q107_urls_parse"] = QueryDef(
    q107_urls_parse, Q107_SQL, "F2 urls→structs (helpers.py:23-29)"
)


# --------------------------------------------------------------------------
# q108 — clean_org_name (F3): legal-suffix/stopword strip parity
# --------------------------------------------------------------------------

def q108_clean_org_name(spark, sf_dir):
    """F3: Hebrew legal-suffix and stopword cleanup
    (srm_tools/data_cleaning.py:5-24) over synthesized org names
    ('עמותת מרכז <name> (ע״ר)'). The SQL twin is GENERATED from the same
    suffix/stopword lists in the same interleaved order (replace →
    edge-trim per suffix), so the two chains cannot drift apart."""
    from ..functions.cleaning import clean_org_name  # noqa: PLC0415

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    raw = F.concat(F.lit("עמותת מרכז "), F.col("c_name"), F.lit(" (ע״ר)"))
    return c.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        clean_org_name(raw).alias("org_name"),
    )


def _q108_sql() -> str:
    from ..functions.cleaning import _ORG_STOPWORDS, _ORG_SUFFIXES  # noqa: PLC0415

    expr = "'עמותת מרכז ' || c_name || ' (ע״ר)'"
    for sfx in _ORG_SUFFIXES:
        lit = sfx.replace("'", "''")
        expr = f"replace({expr}, '{lit}', '')"
        expr = f"regexp_replace({expr}, '^[,.()\\s]+|[,.()\\s]+$', '', 'g')"
    for word in _ORG_STOPWORDS:
        lit = word.replace("'", "''")
        expr = f"replace({expr}, '{lit}', '')"
    expr = f"regexp_replace({expr}, '^[ \\-,\\n\\t]+|[ \\-,\\n\\t]+$', '', 'g')"
    return (
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, "
        + expr
        + " AS org_name FROM customer"
    )


EXT10_REGISTRY["q108_clean_org_name"] = QueryDef(
    q108_clean_org_name, _q108_sql(), "F3 clean_org_name (data_cleaning.py:5-24)"
)
