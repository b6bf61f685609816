"""Round-2 extension queries: duplicate clustering (connected components),
sketch aggregates, and a stream-stream interval join.

Same contract as plans/queries.py: each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame whose columns are aliased
identically to its DuckDB oracle.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from ..operators.graph import duplicate_clusters
from .queries import Q28_SQL, QueryDef, _t
from .queries import q28_jaccard_pairs as _q28_pairs

# --------------------------------------------------------------------------
# q62 — duplicate clusters: near-dup pairs -> connected components
# --------------------------------------------------------------------------


def q62_dup_clusters(spark, sf_dir):
    """Pairs → clusters: the token-Jaccard near-dup pairs (q28's exact pair
    set) resolved into connected components by distributed min-label
    propagation (operators/graph.py), labeling every clustered document with
    the min doc_id of its component plus the cluster size. This is the step
    that turns pairwise dedup output into 'keep one canonical doc per
    cluster' at corpus scale — the reference does it inside a single-process
    pandas groupby (operators/derive/to_dp.py:237-286)."""
    pairs = _q28_pairs(spark, sf_dir)
    return duplicate_clusters(pairs, "left_id", "right_id").select(
        F.col("node").alias("doc_id"), "component", "cluster_size"
    )


# The oracle replays the same pair set (q28's SQL, verbatim) and computes each
# node's component as min reachable node via a recursive CTE — transitive
# closure collapsed by UNION-distinct.
Q62_SQL = f"""
WITH RECURSIVE pairs AS ({Q28_SQL}),
edges AS (
  SELECT left_id AS a, right_id AS b FROM pairs
  UNION ALL
  SELECT right_id AS a, left_id AS b FROM pairs
),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT node AS doc_id, component,
       CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
FROM comp
"""


# --------------------------------------------------------------------------
# q63 — sketch aggregates: HLL distinct + KLL-ish percentile vs exact twins
# --------------------------------------------------------------------------


def q63_sketch_agg(spark, sf_dir):
    """Sketch aggregates next to their exact twins: per order priority, HLL++
    approx distinct customers (rsd 2%) and approx median price (accuracy
    10000) are computed alongside the exact values; the query emits the exact
    values plus booleans asserting the sketches landed inside their error
    envelopes. The oracle pins the exact columns and the envelope booleans —
    if a sketch drifts out of tolerance the hash check fails, so the sketches
    are gate-verified without demanding cross-engine sketch-identical
    output (DuckDB's HLL is a different implementation)."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.approx_count_distinct("o_custkey", 0.02).alias("_ad"),
        F.expr("percentile(o_totalprice, 0.5D)").alias("_em"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("_am"),
    )
    return agg.select(
        "o_orderpriority",
        "exact_distinct",
        F.round("_em", 2).alias("exact_median"),
        (F.abs(F.col("_ad") - F.col("exact_distinct")) / F.col("exact_distinct") <= 0.05).alias(
            "distinct_sketch_ok"
        ),
        (F.abs(F.col("_am") - F.col("_em")) / F.col("_em") <= 0.01).alias("median_sketch_ok"),
    )


Q63_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS exact_distinct,
       round(median(o_totalprice), 2) AS exact_median,
       TRUE AS distinct_sketch_ok,
       TRUE AS median_sketch_ok
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q64 — stream-stream interval join (click -> purchase within 30 minutes)
# --------------------------------------------------------------------------

_Q64_SINK_IDS = itertools.count()


def q64_stream_join(spark, sf_dir):
    """Stream-stream inner join with a time-range predicate
    (streaming/events.py:interval_join): purchases landing within 30 minutes
    of a click by the same user, replayed through two file-source streams and
    an append-mode memory sink, then reduced to per-user pair counts. The
    watermark exceeds the replayed span so no pair is dropped and the result
    equals the batch join the oracle runs — the per-microbatch state pruning
    (right watermark past click_ts + delay) is exactly what bounds join state
    on an unbounded cluster deployment."""
    from ..streaming.events import interval_join, run_to_memory, stream_events  # noqa: PLC0415

    name = f"q64_sink_{next(_Q64_SINK_IDS)}"
    clicks = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
    )
    purchases = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"), F.col("value").alias("purchase_value"))
    )
    joined = interval_join(
        clicks, purchases, "user_id", "click_ts", "purchase_ts",
        max_delay="30 minutes", watermark="60 days",
    )
    run_to_memory(joined, name, mode="append")
    sink = spark.table(name)
    return sink.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("purchase_ts").alias("n_purchases"),
        F.round(F.sum(F.col("purchase_value").cast("decimal(18,6)")).cast("double"), 6).alias(
            "sum_purchase_value"
        ),
    )


Q64_SQL = """
SELECT c.user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT p.ts) AS BIGINT) AS n_purchases,
       round(CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_purchase_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY c.user_id
"""


EXT4_REGISTRY = {
    "q62_dup_clusters": QueryDef(q62_dup_clusters, Q62_SQL, "dedup clustering (connected components)"),
    "q63_sketch_agg": QueryDef(q63_sketch_agg, Q63_SQL, "sketch aggregates (HLL++ / approx percentile)"),
    "q64_stream_join": QueryDef(q64_stream_join, Q64_SQL, "§2.12 stream-stream interval join"),
}
