"""Graph operators: connected components over candidate-pair edge lists.

Near-duplicate detection (``operators/dedup.py``) emits *pairs*; turning pairs
into duplicate *clusters* — so one canonical document survives per cluster, not
one per pair — is a connected-components problem. The reference resolves its
duplicate groups inside a single-process pandas groupby
(``operators/derive/to_dp.py:237-286``); at corpus scale the pair graph is
distributed, so the cluster id must be computed by message passing.

Algorithm: iterated min-label propagation. Every node starts labeled with its
own id; each round every node takes the min label among itself and its
neighbors; a fixpoint labels every node with the min node id of its connected
component. Rounds needed = graph diameter, and each round is one shuffle keyed
by node id.

Scale notes (100 TB):
- Near-dup graphs are overwhelmingly tiny cliques/stars (diameter 1-2), so
  min-propagation converges in 2-3 rounds. For adversarially deep graphs
  (long chains) the O(log^2 n) large-star/small-star scheme of Kiveris et al.,
  "Connected Components in MapReduce and Beyond" (SoCC'14) bounds rounds
  independent of diameter; the propagation loop below is the same join/agg
  skeleton, so swapping the update rule is local.
- Each iteration's labels are ``localCheckpoint``-ed: without truncation the
  lineage doubles per round and Catalyst re-analyzes an exponentially growing
  plan (and a failure would recompute the whole chain).
- The symmetrized edge list is persisted once and reused every round; the
  per-round shuffle is proportional to |E|, never |V|^2.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in the undirected pair graph.

    ``component`` is the minimum node id reachable from ``node`` — a
    deterministic, engine-neutral cluster id. Nodes absent from ``pairs``
    (singletons) are not returned; union them in with ``component = node`` if
    the full corpus labeling is needed.

    Converges when no label changes (checked with an ``isEmpty`` probe per
    round — a driver-side boolean, not a collect of data). Raises if the graph
    has not converged after ``max_iter`` rounds rather than returning a wrong
    labeling.
    """
    sc = pairs.sparkSession.sparkContext

    def _ckpt(df: DataFrame):
        """Eager localCheckpoint + the set of persistent-RDD ids it created,
        so the round loop can free exactly its own blocks later (executor
        storage would otherwise grow linearly with iteration count)."""
        before = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
        out = df.localCheckpoint(eager=True)
        after = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
        return out, after - before

    def _free(ids) -> None:
        rdds = sc._jsc.getPersistentRDDs()
        for i in ids:
            rdd = rdds.get(i)
            if rdd is not None:
                rdd.unpersist(False)

    # symmetrize with one explode — a union of the plan with its swap would
    # execute the (possibly expensive) upstream pair-generation plan twice.
    # Then pre-partition on the per-round join key and cache THAT layout: the
    # cached relation keeps hash(b) as its output partitioning, so every
    # round's edges⋈labels join shuffles only the (small, shrinking) label
    # side — the edge list is shuffled exactly once for the whole algorithm.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(left_col).alias("a"), F.col(right_col).alias("b")
                    ),
                    F.struct(
                        F.col(right_col).alias("a"), F.col(left_col).alias("b")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .repartition(F.col("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # fused first round: label(v) = min(v, min neighbor) is a pure aggregate
    # over the (symmetric) edge list — no join needed, one round saved
    labels, labels_ids = _ckpt(
        edges.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("component"))
        .select(F.col("a").alias("node"), "component")
    )
    for _ in range(max_iter):
        # min label among each node's neighbors, this round
        nbr_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        # one left join folds the neighbor minimum into every label (least()
        # skips nulls for isolated-this-round nodes); the convergence flag
        # rides in the checkpointed data, so each round is a single
        # materialization plus a cached-read emptiness probe — no
        # anti-join+union reshuffle, no separate improvement checkpoint
        new_labels, new_ids = _ckpt(
            labels.join(nbr_min, labels.node == nbr_min.a, "left").select(
                "node",
                F.least("component", "nbr_min").alias("component"),
                F.coalesce(
                    F.col("nbr_min") < F.col("component"), F.lit(False)
                ).alias("_changed"),
            )
        )
        converged = new_labels.filter(F.col("_changed")).isEmpty()
        _free(labels_ids)
        labels, labels_ids = new_labels.select("node", "component"), new_ids
        if converged:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds "
        "(graph diameter exceeds max_iter; raise max_iter or switch to "
        "large-star/small-star)"
    )


def duplicate_clusters(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """(node, component, cluster_size) for every clustered node.

    The canonical survivor of each cluster is ``node == component`` (min id);
    everything else is a duplicate to drop — the cluster generalization of
    :func:`srm_etl_spark.operators.dedup.minhash_dedup`'s pairwise loser rule.
    """
    cc = connected_components(pairs, left_col, right_col)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select("node", "component", "cluster_size")
