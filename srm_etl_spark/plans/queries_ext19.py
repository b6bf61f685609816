"""Round-7 extension queries, part 2: the last uncovered reference
operators — deploy, benchmark's decision kernel, and presets' query
assembly.

q150 — deploy: DeploySpec-driven base→base table sync (reference
       operators/deploy/__init__.py:13-86): emit only changed rows with
       source values, append source-only rows when add_missing, 'src:dst'
       rename.
q151 — the did-you-mean rerank kernel (benchmark/__init__.py:42-68):
       log-length doc_count scaling, re-sort, shard/threshold gate. (The
       HTTP transport around it is S-layer, covered by the connector
       suite.)
q152 — presets homepage_query (presets/__init__.py:21-33; the reference
       operator is deprecated — run() returns early — but the assembly
       logic is its public behavior): response-for-situation phrase,
       underscore-joined.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.benchmark import dym_rerank
from ..operators.deploy import deploy_table
from .queries import QueryDef, _t


def q150_deploy(spark, sf_dir):
    """Two DeploySpecs over fixture bases: a synonyms spec (add_missing)
    and a location spec with a 'resolved_lat:fixed_lat' rename
    (add_missing=False). Unchanged rows must vanish from the payload."""
    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    target_a = s.filter(k % 7 != 3).select(
        F.concat(F.lit("t-"), k.cast("string")).alias("id"),
        F.concat(F.lit("סינ "), (k % 5).cast("string")).alias("synonyms"),
    )
    source_a = s.filter(k % 5 != 4).select(
        F.concat(F.lit("t-"), k.cast("string")).alias("id"),
        F.when(k % 3 == 0, F.concat(F.lit("סינ "), (k % 5).cast("string")))
        .otherwise(F.concat(F.lit("חדש "), (k % 4).cast("string")))
        .alias("synonyms"),
    )
    a = deploy_table(target_a, source_a, "id", ["synonyms"], add_missing=True).select(
        F.lit("situations").alias("table"),
        "id",
        F.col("synonyms").alias("v1"),
        F.lit(None).cast("string").alias("v2"),
    )

    c = _t(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    target_b = c.filter(ck % 2 == 0).select(
        F.concat(F.lit("L"), ck.cast("string")).alias("id"),
        F.when(ck % 4 == 0, F.lit("ACTIVE")).otherwise(F.lit("DONE")).alias("status"),
        (F.lit(31.0) + (ck % 90) / F.lit(100.0)).alias("resolved_lat"),
    )
    source_b = c.filter(ck % 3 != 1).select(
        F.concat(F.lit("L"), ck.cast("string")).alias("id"),
        F.lit("ACTIVE").alias("status"),
        F.when(ck % 5 == 0, F.lit(31.0) + (ck % 90) / F.lit(100.0))
        .otherwise(F.lit(32.5))
        .alias("resolved_lat"),
    )
    b = deploy_table(
        target_b, source_b, "id", ["status", "resolved_lat:fixed_lat"], add_missing=False
    ).select(
        F.lit("locations").alias("table"),
        "id",
        F.col("status").alias("v1"),
        F.round("fixed_lat", 6).cast("string").alias("v2"),
    )
    return a.unionByName(b)


_Q150_SQL = """
WITH tgt_a AS (
  SELECT 't-' || CAST(s_suppkey AS VARCHAR) AS id,
         'סינ ' || CAST(s_suppkey % 5 AS VARCHAR) AS synonyms, s_suppkey AS k
  FROM supplier WHERE s_suppkey % 7 != 3
),
src_a AS (
  SELECT 't-' || CAST(s_suppkey AS VARCHAR) AS id,
         CASE WHEN s_suppkey % 3 = 0 THEN 'סינ ' || CAST(s_suppkey % 5 AS VARCHAR)
              ELSE 'חדש ' || CAST(s_suppkey % 4 AS VARCHAR) END AS synonyms,
         s_suppkey AS k
  FROM supplier WHERE s_suppkey % 5 != 4
),
a_updates AS (
  SELECT t.id, s.synonyms FROM tgt_a t JOIN src_a s USING (id)
  WHERE t.synonyms IS DISTINCT FROM s.synonyms
),
a_missing AS (
  SELECT s.id, s.synonyms FROM src_a s LEFT JOIN tgt_a t USING (id) WHERE t.id IS NULL
),
tgt_b AS (
  SELECT 'L' || CAST(c_custkey AS VARCHAR) AS id,
         CASE WHEN c_custkey % 4 = 0 THEN 'ACTIVE' ELSE 'DONE' END AS status,
         31.0 + (c_custkey % 90) / 100.0 AS resolved_lat
  FROM customer WHERE c_custkey % 2 = 0
),
src_b AS (
  SELECT 'L' || CAST(c_custkey AS VARCHAR) AS id, 'ACTIVE' AS status,
         CASE WHEN c_custkey % 5 = 0 THEN 31.0 + (c_custkey % 90) / 100.0
              ELSE 32.5 END AS resolved_lat
  FROM customer WHERE c_custkey % 3 != 1
),
b_updates AS (
  SELECT t.id, s.status, s.resolved_lat FROM tgt_b t JOIN src_b s USING (id)
  WHERE t.status IS DISTINCT FROM s.status
     OR t.resolved_lat IS DISTINCT FROM s.resolved_lat
)
SELECT 'situations' AS "table", id, synonyms AS v1, CAST(NULL AS VARCHAR) AS v2 FROM a_updates
UNION ALL
SELECT 'situations', id, synonyms, CAST(NULL AS VARCHAR) FROM a_missing
UNION ALL
SELECT 'locations', id, status, CAST(round(resolved_lat, 6) AS VARCHAR) FROM b_updates
"""


def q151_dym_rerank(spark, sf_dir):
    """The did-you-mean choice over synthesized possible_autocomplete
    candidate lists: one native expression (log-length rescale against the
    incumbent, descending re-sort, shard-size/threshold gate)."""
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    pa = F.array(
        F.struct(
            F.concat(F.lit("שירות "), (k % 9).cast("string")).alias("key"),
            (k % 70).cast("double").alias("doc_count"),
        ),
        F.struct(
            F.concat(F.lit("מענה ארוך מאוד "), (k % 4).cast("string")).alias("key"),
            ((k % 35) + F.lit(0.5)).alias("doc_count"),
        ),
        F.struct(
            F.concat(F.lit("עזרה "), (k % 11).cast("string")).alias("key"),
            ((k % 20) + F.lit(0.25)).alias("doc_count"),
        ),
    )
    total = (k % 120).cast("int")
    return p.select(
        k.cast("long").alias("pk"),
        total.alias("total"),
        dym_rerank(pa, total).alias("dym"),
    )


_Q151_SQL = """
WITH base AS (
  SELECT CAST(p_partkey AS BIGINT) AS pk,
         CAST(p_partkey % 120 AS INT) AS total,
         'שירות ' || CAST(p_partkey % 9 AS VARCHAR) AS k1,
         CAST(p_partkey % 70 AS DOUBLE) AS d1,
         'מענה ארוך מאוד ' || CAST(p_partkey % 4 AS VARCHAR) AS k2,
         (p_partkey % 35) + 0.5 AS d2,
         'עזרה ' || CAST(p_partkey % 11 AS VARCHAR) AS k3,
         (p_partkey % 20) + 0.25 AS d3
  FROM part
),
scaled AS (
  SELECT *, d1 AS s1,
         d2 * ln(length(k2)) / ln(length(k1)) AS s2,
         d3 * ln(length(k3)) / ln(length(k1)) AS s3
  FROM base
),
winner AS (
  SELECT *, greatest(s1, s2, s3) AS w,
         CASE WHEN s1 = greatest(s1, s2, s3) THEN k1
              WHEN s2 = greatest(s1, s2, s3) THEN k2
              ELSE k3 END AS wkey
  FROM scaled
)
SELECT pk, total,
       CASE WHEN total >= 10 AND w <= 50 AND w > least(50, total) / 3.0
            THEN wkey END AS dym
FROM winner
"""


def q152_homepage_query(spark, sf_dir):
    """presets homepage_query (deprecated operator, public behavior):
    'response עבור situation' / single-sided fallbacks, whitespace →
    underscores, plus the enumerate-rows score (W1 via the scalable
    ranged-partition path — no single-partition sort)."""
    from ..operators.windows import enumerate_rows  # noqa: PLC0415

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    sit = F.when((k % 4 == 1) | (k % 4 == 3), F.concat(F.lit("מצב קשה "), (k % 5).cast("string")))
    resp = F.when((k % 4 == 2) | (k % 4 == 3), F.concat(F.lit("מענה טוב "), (k % 7).cast("string")))
    q = (
        F.when(sit.isNotNull() & resp.isNotNull(), F.concat(resp, F.lit(" עבור "), sit))
        .when(sit.isNotNull(), sit)
        .when(resp.isNotNull(), resp)
    )
    q = F.regexp_replace(q, r"\s+", "_")
    base = c.select(k.cast("long").alias("ck"), q.alias("homepage_query"))
    return enumerate_rows(base, ["ck"], out_col="score").select(
        "ck", "homepage_query", F.col("score").cast("long").alias("score")
    )


_Q152_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS ck,
       CASE WHEN c_custkey % 4 = 3
            THEN replace('מענה טוב ' || CAST(c_custkey % 7 AS VARCHAR)
                 || ' עבור ' || 'מצב קשה ' || CAST(c_custkey % 5 AS VARCHAR), ' ', '_')
            WHEN c_custkey % 4 = 1
            THEN replace('מצב קשה ' || CAST(c_custkey % 5 AS VARCHAR), ' ', '_')
            WHEN c_custkey % 4 = 2
            THEN replace('מענה טוב ' || CAST(c_custkey % 7 AS VARCHAR), ' ', '_')
            END AS homepage_query,
       CAST(row_number() OVER (ORDER BY c_custkey) - 1 AS BIGINT) AS score
FROM customer
"""

EXT19_REGISTRY = {
    "q150_deploy": QueryDef(
        q150_deploy,
        _Q150_SQL,
        "deploy spec sync (changed-only emit, add_missing, rename)",
    ),
    "q151_dym_rerank": QueryDef(
        q151_dym_rerank,
        _Q151_SQL,
        "did-you-mean rerank kernel (log-length rescale + threshold gate)",
    ),
    "q152_homepage_query": QueryDef(
        q152_homepage_query,
        _Q152_SQL,
        "presets homepage query assembly + enumerate score",
    ),
}
