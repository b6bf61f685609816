"""Round-4 extension queries, part 4: the observability layer.

q89 — one-pass table profile (operators/profiling.py:profile_table) — the
      Deequ-shaped per-column summary a pipeline gate reads before
      promoting a new snapshot.
q90 — population-stability-index drift between two corpus slices
      (operators/profiling.py:psi) — the "did the distribution move"
      monitor, on the engine's quality score.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..operators.profiling import profile_table, psi
from .queries import QueryDef, _t


# --------------------------------------------------------------------------
# q89 — one-pass table profile
# --------------------------------------------------------------------------

def q89_profile(spark, sf_dir):
    """Profile of the documents table: per column its null count, exact
    distinct count and native-order min/max — computed in ONE aggregate
    pass and unpivoted with stack, so the scan cost is a single read
    however many columns are profiled."""
    d = _t(spark, sf_dir, "documents")
    return profile_table(d, ["doc_id", "text", "lang", "source", "n_chars"])


_PROF_COL = """
SELECT '{c}' AS col_name,
       CAST(n.n_rows AS BIGINT) AS n_rows,
       CAST(n.n_rows - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM documents, (SELECT count(*) AS n_rows FROM documents) n
GROUP BY n.n_rows
"""

Q89_SQL = " UNION ALL ".join(
    _PROF_COL.format(c=c) for c in ["doc_id", "text", "lang", "source", "n_chars"]
)


# --------------------------------------------------------------------------
# q90 — quality-score drift (PSI) between corpus halves
# --------------------------------------------------------------------------

def q90_quality_drift(spark, sf_dir):
    """PSI of the quality-score distribution between the even- and odd-id
    halves of the corpus: closed-form binning (floor over a fixed range) so
    both engines bin identically, fractions floored at 1e-6 so empty bins
    contribute finitely. Two small hash aggregates + a 5-row join."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", quality_score(F.col("text")).alias("q")
    )
    out = psi(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        "q",
        lo=0.0,
        hi=1.0,
        bins=5,
    )
    return out.select(
        F.col("bin").cast("long").alias("bin"),
        F.round("expected_frac", 6).alias("expected_frac"),
        F.round("actual_frac", 6).alias("actual_frac"),
        F.round("psi_term", 8).alias("psi_term"),
    )


_QUALITY_SQL = """
  SELECT doc_id,
    round((
      least(CAST(len(toks) AS DOUBLE) / 50, 1.0)
      + 1.0 - least(CASE WHEN nonspace = 0 THEN 0.0
                         ELSE CAST(n_punct AS DOUBLE) / nonspace END * 4, 1.0)
      + CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CASE WHEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)
                            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END END
    ) / 3.0, 4) AS q
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks,
           length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
           length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS n_punct
    FROM documents
  )
"""

Q90_SQL = f"""
WITH scored AS ({_QUALITY_SQL}),
binned AS (
  SELECT doc_id % 2 AS side,
         CAST(least(greatest(floor(q / CAST(0.2 AS DOUBLE)), 0), 4) AS BIGINT) AS bin
  FROM scored
),
tot AS (SELECT side, CAST(count(*) AS DOUBLE) AS n FROM binned GROUP BY side),
fr AS (
  SELECT b.side, b.bin, count(*) / t.n AS frac
  FROM binned b JOIN tot t USING (side) GROUP BY b.side, b.bin, t.n
),
bins AS (SELECT unnest(range(5)) AS bin),
j AS (
  SELECT bins.bin,
         coalesce(e.frac, 0.0) AS expected_frac,
         coalesce(a.frac, 0.0) AS actual_frac
  FROM bins
  LEFT JOIN (SELECT bin, frac FROM fr WHERE side = 0) e USING (bin)
  LEFT JOIN (SELECT bin, frac FROM fr WHERE side = 1) a USING (bin)
)
SELECT CAST(bin AS BIGINT) AS bin,
       round(expected_frac, 6) AS expected_frac,
       round(actual_frac, 6) AS actual_frac,
       round((greatest(actual_frac, 1e-6) - greatest(expected_frac, 1e-6))
             * ln(greatest(actual_frac, 1e-6) / greatest(expected_frac, 1e-6)), 8) AS psi_term
FROM j
"""


EXT9_REGISTRY = {
    "q89_profile": QueryDef(
        q89_profile, Q89_SQL, "LLM-pipeline: one-pass table profiling (A9-ext)"
    ),
    "q90_quality_drift": QueryDef(
        q90_quality_drift, Q90_SQL, "LLM-pipeline: PSI distribution drift (P7-ext)"
    ),
}


# --------------------------------------------------------------------------
# q91 — quantized ANN: top-k over the int8 corpus
# --------------------------------------------------------------------------

def q91_quantized_topk(spark, sf_dir):
    """Serving-path follow-through of q85: top-5 neighbors by cosine over
    the int8-quantized corpus (scale cancels in cosine, so the quantized
    corpus is directly searchable). The dot products are exact integer
    arithmetic — bit-identical across engines — and the corpus side stays
    4x smaller in memory than float32. Broadcast queries, streamed corpus,
    per-query ranked window (the q29 shape on quantized payloads)."""
    from pyspark.sql import Window  # noqa: PLC0415

    from ..operators.similarity import quantize_embeddings  # noqa: PLC0415

    emb = _t(spark, sf_dir, "embeddings")

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # norms are precomputed per side BEFORE the non-equi join: otherwise the
    # corpus norm re-runs a dim-length aggregate once per (corpus x query)
    # pair inside the serving hot loop
    qd = quantize_embeddings(emb, "embedding", "vec_id").select(
        "vec_id", "qvec", F.sqrt(idot(F.col("qvec"), F.col("qvec")).cast("double")).alias("_nrm")
    )
    queries = qd.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("_qq"),
        F.col("_nrm").alias("_qnrm"),
    )

    scored = (
        qd.join(F.broadcast(queries), qd["vec_id"] != queries["query_id"])
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (idot(F.col("qvec"), F.col("_qq")) / (F.col("_nrm") * F.col("_qnrm"))).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            F.round("qcos", 4).alias("qcos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


Q91_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(127.0 AS DOUBLE) / list_max(list_transform(v, x -> abs(x))) END AS scale
      FROM e),
q AS (SELECT vec_id, list_transform(v, x -> CAST(round(x * scale) AS BIGINT)) AS qvec FROM s),
qq AS (SELECT vec_id AS query_id, qvec AS qv FROM q WHERE vec_id < 5),
scored AS (
  SELECT qq.query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(c.qvec, qq.qv), p -> p[1] * p[2]))
         / (sqrt(CAST(list_sum(list_transform(c.qvec, x -> x * x)) AS DOUBLE))
            * sqrt(CAST(list_sum(list_transform(qq.qv, x -> x * x)) AS DOUBLE))) AS qcos
  FROM q c CROSS JOIN qq WHERE c.vec_id != qq.query_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       round(qcos, 4) AS qcos, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""

EXT9_REGISTRY["q91_quantized_topk"] = QueryDef(
    q91_quantized_topk, Q91_SQL, "LLM-pipeline: int8 quantized ANN serving"
)


# --------------------------------------------------------------------------
# q92 — product quantization: encode + ADC top-k (rows-only)
# --------------------------------------------------------------------------

def q92_pq_topk(spark, sf_dir):
    """IVFPQ's fine half: per-subspace k-means codebooks → m-byte codes
    (64x smaller than float32) → asymmetric-distance top-5 by table lookup
    (operators/similarity.py:pq_*). Codebook training is k-means (driver
    syncs the m×k codeword matrix — bounded by construction); encode and
    search are pure codegen over the 1-byte-per-subspace corpus.
    Training is deterministic (q83's fixed init + 6-decimal centroid grid),
    so the two Lloyd iterations unroll into the DuckDB oracle and the whole
    train→encode→ADC pipeline is hash-checked end-to-end."""
    from ..operators.similarity import pq_encode, pq_topk, pq_train_codebooks  # noqa: PLC0415

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb, m=4, k=8, iterations=2, dim=64)
    codes = pq_encode(emb, books, dim=64)
    queries = emb.filter(F.col("vec_id") < 5)
    out = pq_topk(codes, books, queries, k=5, dim=64)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.round("adc_dist", 4).alias("adc_dist"),
        F.col("rank").cast("long").alias("rank"),
    )


# CTE chain through the ADC ranking (`ranked`, over `e`/`codes`/`c2`) —
# shared with q116's rerank oracle, which shortlists at a larger k and
# re-scores the shortlist with exact cosine.
Q92_CORE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, v
         FROM e ORDER BY vec_id LIMIT 8),
-- per-subspace views: subvector j = v[j*16+1 .. (j+1)*16]
sube AS (SELECT vec_id, g.j, list_slice(v, g.j*16 + 1, (g.j+1)*16) AS sv
         FROM e, generate_series(0, 3) AS g(j)),
c0 AS (SELECT g.j, cid, list_slice(v, g.j*16 + 1, (g.j+1)*16) AS c
       FROM init, generate_series(0, 3) AS g(j)),
-- Lloyd iteration 1 (argmin tie-breaks on cid, the array_min struct order)
a1 AS (SELECT vec_id, j, sv, cid FROM (
         SELECT s.vec_id, s.j, s.sv, c.cid,
                row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
                  list_sum(list_transform(list_zip(s.sv, c.c),
                                          p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
         FROM sube s JOIN c0 c ON s.j = c.j) WHERE rn = 1),
c1 AS (SELECT j, cid, list(val ORDER BY pos) AS c FROM (
         SELECT j, cid, pos, round(CAST(list_reduce(list_sort(list(CAST(x AS DOUBLE))), (a, b) -> a + b) AS DOUBLE) / count(x), 6) AS val FROM (
           SELECT j, cid, generate_subscripts(sv, 1) AS pos, unnest(sv) AS x FROM a1)
         GROUP BY j, cid, pos)
       GROUP BY j, cid),
-- Lloyd iteration 2
a2 AS (SELECT vec_id, j, sv, cid FROM (
         SELECT s.vec_id, s.j, s.sv, c.cid,
                row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
                  list_sum(list_transform(list_zip(s.sv, c.c),
                                          p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
         FROM sube s JOIN c1 c ON s.j = c.j) WHERE rn = 1),
c2 AS (SELECT j, cid, list(val ORDER BY pos) AS c FROM (
         SELECT j, cid, pos, round(CAST(list_reduce(list_sort(list(CAST(x AS DOUBLE))), (a, b) -> a + b) AS DOUBLE) / count(x), 6) AS val FROM (
           SELECT j, cid, generate_subscripts(sv, 1) AS pos, unnest(sv) AS x FROM a2)
         GROUP BY j, cid, pos)
       GROUP BY j, cid),
-- encode: nearest final codeword per (vector, subspace)
codes AS (SELECT vec_id, j, cid FROM (
            SELECT s.vec_id, s.j, c.cid,
                   row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
                     list_sum(list_transform(list_zip(s.sv, c.c),
                                             p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
            FROM sube s JOIN c2 c ON s.j = c.j) WHERE rn = 1),
-- ADC: per-query distance table (query subvector vs every codeword), then
-- a document's distance = sum of its m table lookups
qd AS (SELECT q.vec_id AS query_id, c.j, c.cid,
              list_sum(list_transform(list_zip(q.sv, c.c),
                                      p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
       FROM (SELECT vec_id, j, sv FROM sube WHERE vec_id < 5) q
       JOIN c2 c ON q.j = c.j),
dist AS (SELECT qd.query_id, codes.vec_id AS neighbor_id, sum(qd.d) AS adc
         FROM codes JOIN qd ON codes.j = qd.j AND codes.cid = qd.cid
         GROUP BY qd.query_id, codes.vec_id),
ranked AS (SELECT query_id, neighbor_id, adc,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc ASC, neighbor_id ASC) AS rank
           FROM dist WHERE neighbor_id != query_id)"""

Q92_SQL = Q92_CORE + """
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       round(adc, 4) AS adc_dist, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


EXT9_REGISTRY["q92_pq_topk"] = QueryDef(
    q92_pq_topk, Q92_SQL, "LLM-pipeline: product-quantized ANN (IVFPQ fine half)"
)


# --------------------------------------------------------------------------
# q93 — incremental derive == full recompute
# --------------------------------------------------------------------------

def q93_incremental_cards(spark, sf_dir):
    """Incremental card refresh (pipelines/incremental.py): a slice of
    branches "arrives", only the owning orgs' cards are rebuilt, and the
    merged table must hash-match the FULL derive — the oracle is q35's SQL
    verbatim. Shuffle of the refresh is proportional to the change set;
    untouched orgs' cards pass through a broadcast anti-join."""
    from ..pipelines.incremental import demo_incremental_vs_full  # noqa: PLC0415

    cards = demo_incremental_vs_full(spark, sf_dir)
    return cards.drop("card_id").withColumn(
        "organization_branch_count", F.col("organization_branch_count").cast("long")
    )


from .queries import Q35_SQL  # noqa: E402

EXT9_REGISTRY["q93_incremental_cards"] = QueryDef(
    q93_incremental_cards, Q35_SQL, "K6-ext incremental derive refresh §3.1"
)


# --------------------------------------------------------------------------
# q94 — skew diagnostics report
# --------------------------------------------------------------------------

def q94_skew_report(spark, sf_dir):
    """Key-distribution diagnostic (operators/skew.py:skew_report) over the
    orders-per-customer distribution: top-10 heaviest keys with share, skew
    factor vs the mean key, and the salt count that would level each — what
    an engineer reads before picking broadcast/salt/AQE for the join."""
    from ..operators.skew import skew_report  # noqa: PLC0415

    o = _t(spark, sf_dir, "orders")
    out = skew_report(o, "o_custkey", top=10)
    return out.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("key_rows").cast("long").alias("key_rows"),
        F.round("share", 8).alias("share"),
        F.round("skew_factor", 6).alias("skew_factor"),
        "suggested_salt",
    )


Q94_SQL = """
WITH counts AS (SELECT o_custkey, count(*) AS key_rows FROM orders GROUP BY o_custkey),
tot AS (SELECT CAST(sum(key_rows) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS nkeys FROM counts)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(key_rows AS BIGINT) AS key_rows,
       round(key_rows / total, 8) AS share,
       round(key_rows / (total / nkeys), 6) AS skew_factor,
       CAST(ceil(key_rows / (total / nkeys)) AS BIGINT) AS suggested_salt
FROM counts CROSS JOIN tot
ORDER BY key_rows DESC, o_custkey ASC
LIMIT 10
"""

EXT9_REGISTRY["q94_skew_report"] = QueryDef(
    q94_skew_report, Q94_SQL, "AQE/skew diagnostics (§4.2 welfare-ministry shape)"
)
