"""Round-4 extension queries, part 2: the remaining pillars of a
training-data pipeline at corpus scale.

q80 — benchmark decontamination: n-gram collision report between the corpus
      and a held-out eval set (operators/decontaminate.py).
q81 — per-(source, lang) quality quota: keep the top-K docs by the engine's
      quality score — the "cap each domain's contribution" curation step.
q82 — fixed-iteration PageRank over the supplier↔customer interaction graph
      (operators/graph.py:pagerank) — link-based source weighting.
q83 — Lloyd's k-means over the embedding corpus (operators/similarity.py:
      kmeans) — the IVF quantizer trainer / semantic-dedup clusterer,
      verified against a fully unrolled two-iteration SQL twin.
q84 — overlapping token-window chunking with stable chunk ids
      (operators/chunking.py) — RAG/embedding prep.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..operators import similarity as SIM
from ..operators.chunking import chunk_documents
from ..operators.decontaminate import contamination_report
from ..operators.graph import pagerank
from ..operators.windows import top_k_per_group
from .queries import _NORM, QueryDef, _t


# --------------------------------------------------------------------------
# q80 — decontamination (eval set = doc_id % 37 == 0, the held-out slice)
# --------------------------------------------------------------------------

def q80_decontamination(spark, sf_dir):
    """N-gram collision decontamination report: corpus docs sharing >= 2
    distinct word trigrams with the eval slice. The eval gram set is
    broadcast; corpus-side shingling and probing stay map-side, so the only
    shuffle carries actual collisions (operators/decontaminate.py)."""
    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 37 == 0)
    corpus = d.filter(F.col("doc_id") % 37 != 0)
    out = contamination_report(corpus, ev, n=3, min_overlap=2)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("matched_ngrams").cast("long").alias("matched_ngrams"),
        F.col("total_ngrams").cast("long").alias("total_ngrams"),
        "contamination_pct",
    )


Q80_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split({_NORM.format(c='text')}, ' '), t -> t != '') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                     generate_series(1, greatest(len(t) - 2, 1)),
                     i -> array_to_string(list_slice(t, i, i + 2), ' '))) END AS g
  FROM toks
), ev AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 37 = 0
), corp AS (
  SELECT doc_id, len(g) AS total_ngrams, unnest(g) AS gram
  FROM grams WHERE doc_id % 37 != 0
), hit AS (
  SELECT c.doc_id, c.total_ngrams, count(*) AS matched_ngrams
  FROM corp c JOIN ev USING (gram)
  GROUP BY c.doc_id, c.total_ngrams
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(matched_ngrams AS BIGINT) AS matched_ngrams,
       CAST(total_ngrams AS BIGINT) AS total_ngrams,
       round(CAST(matched_ngrams AS DOUBLE) * 100 / total_ngrams, 4) AS contamination_pct
FROM hit WHERE matched_ngrams >= 2
"""


# --------------------------------------------------------------------------
# q81 — per-(source, lang) quality quota
# --------------------------------------------------------------------------

def q81_source_quota(spark, sf_dir):
    """Quota curation: cap every (source, lang) stratum at its 15 best docs
    by quality score (desc, doc_id tiebreak). One window shuffle keyed by the
    stratum; the quality score itself is pure codegen column math."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", "lang", quality_score(F.col("text")).alias("quality")
    )
    kept = top_k_per_group(
        scored,
        ["source", "lang"],
        [F.col("quality").desc(), F.col("doc_id").asc()],
        k=15,
    )
    return kept.select(
        "source",
        "lang",
        F.col("doc_id").cast("long").alias("doc_id"),
        "quality",
        F.col("rank").cast("long").alias("rank"),
    )


Q81_SQL = """
WITH base AS (
  SELECT doc_id, source, lang,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks,
         length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS n_punct
  FROM documents
), q AS (
  SELECT doc_id, source, lang,
    round((
      least(CAST(len(toks) AS DOUBLE) / 50, 1.0)
      + 1.0 - least(CASE WHEN nonspace = 0 THEN 0.0
                         ELSE CAST(n_punct AS DOUBLE) / nonspace END * 4, 1.0)
      + CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CASE WHEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)
                            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END END
    ) / 3.0, 4) AS quality
  FROM base
)
SELECT source, lang, CAST(doc_id AS BIGINT) AS doc_id, quality, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY source, lang ORDER BY quality DESC, doc_id) AS rank
  FROM q
) WHERE rank <= 15
"""


# --------------------------------------------------------------------------
# q82 — PageRank over the symmetrized supplier↔customer graph
# --------------------------------------------------------------------------

def q82_pagerank(spark, sf_dir):
    """3-iteration PageRank (d=0.85) over the symmetrized supplier↔customer
    interaction graph (an edge per distinct lineitem supplier→order customer
    relationship, both directions, so no node is dangling; node ids encoded
    as longs — even = supplier·2, odd = customer·2+1 — because 8-byte keys
    shuffle far cheaper than formatted strings). Per-iteration shuffle ∝ |E|
    — operators/graph.py:pagerank."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # integer-encoded nodes (even = supplier 2k, odd = customer 2k+1):
    # 8-byte keys shuffle/compare far cheaper than formatted strings at |E|
    e0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # distinct before the union: the reversed half of a distinct bipartite
    # list is distinct and disjoint, so the union needs no second dedup
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # checkpoint_every=2 batches two iterations per localCheckpoint pin: each
    # iteration's subtree appears exactly once in the batched plan (ranks are
    # referenced once per round), so the arithmetic is unchanged while the
    # materialization barriers (block write + job launch per round) halve.
    pr = pagerank(
        edges,
        iterations=3,
        damping=0.85,
        checkpoint_every=2,
        assume_distinct=True,
        symmetric=True,
    )
    return pr.select(F.col("node").cast("long").alias("node"), F.round("pr", 6).alias("pr"))


Q82_SQL = """
WITH e0 AS (
  SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0
), nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS pr FROM nodes CROSS JOIN nn),
c1 AS (SELECT e.dst AS node, sum(p.pr / d.outdeg) AS c
       FROM edges e JOIN p0 p ON e.src = p.node JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
p1 AS (SELECT n.node,
              (SELECT (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n FROM nn)
              + CAST(0.85 AS DOUBLE) * coalesce(c1.c, 0) AS pr
       FROM nodes n LEFT JOIN c1 USING (node)),
c2 AS (SELECT e.dst AS node, sum(p.pr / d.outdeg) AS c
       FROM edges e JOIN p1 p ON e.src = p.node JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
p2 AS (SELECT n.node,
              (SELECT (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n FROM nn)
              + CAST(0.85 AS DOUBLE) * coalesce(c2.c, 0) AS pr
       FROM nodes n LEFT JOIN c2 USING (node)),
c3 AS (SELECT e.dst AS node, sum(p.pr / d.outdeg) AS c
       FROM edges e JOIN p2 p ON e.src = p.node JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
p3 AS (SELECT n.node,
              (SELECT (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n FROM nn)
              + CAST(0.85 AS DOUBLE) * coalesce(c3.c, 0) AS pr
       FROM nodes n LEFT JOIN c3 USING (node))
SELECT CAST(node AS BIGINT) AS node, round(pr, 6) AS pr FROM p3
"""


# --------------------------------------------------------------------------
# q83 — k-means (2 Lloyd iterations, k=8) over the embedding corpus
# --------------------------------------------------------------------------

def q83_kmeans(spark, sf_dir):
    """Lloyd's k-means summary: per final cluster its member count and its
    centroid (rounded to 4). The full unrolled two-iteration computation —
    deterministic init from the 8 smallest vec_ids, intermediate centroids
    pinned to a 6-decimal grid — is mirrored exactly by the SQL twin."""
    emb = _t(spark, sf_dir, "embeddings")
    assigned = SIM.kmeans(emb, "embedding", "vec_id", k=8, iterations=2)
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    cents = SIM.centroids(assigned, "cluster", "embedding", round_to=4)
    return (
        cents.join(sizes, "cluster")
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("pos").cast("long").alias("pos"),
            # + 0.0 canonicalizes IEEE negative zero (round can yield -0.0)
            (F.col("value") + F.lit(0.0)).alias("value"),
        )
    )


# CTE chain through the final assignment (a2) — shared with q112's SemDeDup
# oracle, which prunes within the same deterministic clusters.
Q83_CORE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, v
       FROM e ORDER BY vec_id LIMIT 8),
a1 AS (SELECT vec_id, v, cid FROM (
         SELECT e.vec_id, e.v, c.cid,
                row_number() OVER (PARTITION BY e.vec_id ORDER BY
                  list_sum(list_transform(list_zip(e.v, c.v),
                                          p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
         FROM e CROSS JOIN c0 c) WHERE rn = 1),
c1 AS (SELECT cid, list(val ORDER BY pos) AS v FROM (
         SELECT cid, pos, round(CAST(list_reduce(list_sort(list(CAST(x AS DOUBLE))), (a, b) -> a + b) AS DOUBLE) / count(x), 6) AS val FROM (
           SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a1)
         GROUP BY cid, pos)
       GROUP BY cid),
a2 AS (SELECT vec_id, v, cid FROM (
         SELECT e.vec_id, e.v, c.cid,
                row_number() OVER (PARTITION BY e.vec_id ORDER BY
                  list_sum(list_transform(list_zip(e.v, c.v),
                                          p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
         FROM e CROSS JOIN c1 c) WHERE rn = 1)"""

Q83_SQL = Q83_CORE + """,
sizes AS (SELECT cid, count(*) AS n_members FROM a2 GROUP BY cid),
cent AS (SELECT cid, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x FROM a2),
agg AS (SELECT cid, pos, round(CAST(list_reduce(list_sort(list(CAST(x AS DOUBLE))), (a, b) -> a + b) AS DOUBLE) / count(x), 4) + CAST(0.0 AS DOUBLE) AS value FROM cent GROUP BY cid, pos)
SELECT CAST(a.cid AS BIGINT) AS cluster, CAST(s.n_members AS BIGINT) AS n_members,
       CAST(a.pos AS BIGINT) AS pos, a.value
FROM agg a JOIN sizes s USING (cid)
"""


# --------------------------------------------------------------------------
# q84 — overlapping token-window chunking (RAG prep)
# --------------------------------------------------------------------------

def q84_chunking(spark, sf_dir):
    """Chunk every document into 32-token windows at stride 24 (8-token
    overlap). Pure per-row sequence+slice math, no shuffle
    (operators/chunking.py). chunk_id (the sha1 hasher id) is covered by
    pytest — the oracle engine has no sha1, so the deterministic coordinate
    columns are compared here."""
    d = _t(spark, sf_dir, "documents")
    out = chunk_documents(d, chunk_tokens=32, stride=24)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_index",
        "chunk_start",
        "n_chunk_tokens",
        "chunk_text",
    )


Q84_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS t
  FROM documents
), st AS (
  SELECT doc_id, t, unnest(generate_series(1, greatest(len(t), 1), 24)) AS cs
  FROM toks WHERE len(t) > 0
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(floor((cs - 1) / 24.0) AS BIGINT) AS chunk_index,
       CAST(cs AS BIGINT) AS chunk_start,
       CAST(least(32, len(t) - cs + 1) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(t, cs, cs + 31), ' ') AS chunk_text
FROM st
"""


EXT7_REGISTRY = {
    "q80_decontamination": QueryDef(
        q80_decontamination, Q80_SQL, "LLM-pipeline: n-gram benchmark decontamination"
    ),
    "q81_source_quota": QueryDef(
        q81_source_quota, Q81_SQL, "LLM-pipeline: per-source quality quota (O5 W2)"
    ),
    "q82_pagerank": QueryDef(
        q82_pagerank, Q82_SQL, "LLM-pipeline: link-graph PageRank source weighting"
    ),
    "q83_kmeans": QueryDef(
        q83_kmeans, Q83_SQL, "LLM-pipeline: k-means quantizer/semantic clustering"
    ),
    "q84_chunking": QueryDef(
        q84_chunking, Q84_SQL, "LLM-pipeline: overlapping token-window chunking"
    ),
}
