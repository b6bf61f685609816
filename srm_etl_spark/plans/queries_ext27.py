"""Round-14 extension: the production SemDeDup scale path, oracle-gated.

q171 — SemDeDup with every 100 TB lever engaged at once, each one the
       exact-semantics variant the engine ships at scale:
       * sample-trained k-means (``train_filter`` — Lloyd syncs on the
         vec_id %% 2 sample, the FAISS quantizer-training posture; the full
         corpus pays exactly ONE assignment pass),
       * hierarchical coarse-then-fine assignment (k = 96 > the 64-centroid
         literal knee, so the pruned numpy kernel is the path under test —
         exact by construction, and here exact against a flat-argmin SQL
         oracle that knows nothing about the pruning),
       * the salt-split BLAS pair kernel with the lazy 'half-avg' cap
         (S >= 2 on every average-sized cluster at EVERY SF, no plan-time
         driver count — the r13 q112 re-pricing ask: q112 now prices the
         uncapped production shape, this query gates the split).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import semantic_dedup
from .queries import QueryDef, _t

EXT27_REGISTRY: dict[str, QueryDef] = {}

_K = 96          # > ASSIGN_LITERAL_MAX_K: forces the hierarchical kernel
_THRESHOLD = 0.3


def q171_semdedup_production(spark, sf_dir):
    """SemDeDup in the production posture (operators/dedup.py:semantic_dedup):
    k-means trained on the vec_id %% 2 == 0 sample, k=96 (hierarchical
    assignment), duplicates pruned per cluster at cosine >= 0.3 through the
    salt-split kernel with the in-plan 'half-avg' cap — S >= 2 everywhere,
    so the sub-block pair grid's exactly-once emission is what the oracle
    hashes. tests/test_dedup.py pins the salted plan shape (the grid
    grouping + a split factor > 1) so this row cannot silently degrade to
    the unsalted path."""
    emb = _t(spark, sf_dir, "embeddings")
    out = semantic_dedup(
        emb, "embedding", "vec_id", k=_K, iterations=2, threshold=_THRESHOLD,
        max_block_size="half-avg", train_filter=F.col("vec_id") % 2 == 0,
    )
    return out.select("vec_id", "cluster", "kept")


# The oracle is the flat, unsampled-notation replay: train the two Lloyd
# rounds on the vec_id % 2 sample (c0 init = first 96 sample vectors, one
# centroid sync on the 6-decimal grid), assign the FULL corpus to the final
# centroids by flat argmin (no coarse cells — exactness of the pruned kernel
# is exactly what this cross-checks), then prune within clusters.
Q171_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
es AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, v
       FROM es ORDER BY vec_id LIMIT {_K}),
a1 AS (SELECT vec_id, v, cid FROM (
         SELECT es.vec_id, es.v, c.cid,
                row_number() OVER (PARTITION BY es.vec_id ORDER BY
                  list_sum(list_transform(list_zip(es.v, c.v),
                                          p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
         FROM es CROSS JOIN c0 c) WHERE rn = 1),
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
         FROM e CROSS JOIN c1 c) WHERE rn = 1),
simpairs AS (
  SELECT l.vec_id AS lid, r.vec_id AS rid
  FROM a2 l JOIN a2 r ON l.cid = r.cid AND l.vec_id < r.vec_id
  WHERE list_cosine_similarity(l.v, r.v) >= {_THRESHOLD}
),
losers AS (SELECT DISTINCT rid FROM simpairs)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster, (l.rid IS NULL) AS kept
FROM a2 a LEFT JOIN losers l ON a.vec_id = l.rid
"""


EXT27_REGISTRY["q171_semdedup_production"] = QueryDef(
    q171_semdedup_production, Q171_SQL,
    "LLM-pipeline: SemDeDup production path (sample-trained, hierarchical, salt-split)",
)
