"""DoReMi-lite domain reweighting (Xie et al. 2023, arXiv:2305.10429).

DoReMi sets training-mixture domain weights from EXCESS LOSS: how much worse
a reference model (trained on the uniform mixture) does on a domain than a
model adapted to that domain — domains the generic model underfits get
upweighted. The paper runs this with small proxy Transformers inside Group
DRO; the engine's deterministic analogue keeps the exact decision structure
with the corpus-trained bigram LMs it already certifies (q125):

- **reference model** = ONE add-one bigram LM trained on the whole corpus
  (the uniform-mixture stand-in);
- **domain model** = one bigram LM per ``source`` (the domain-adapted
  stand-in, ``bigram_logprob_scores(group_col="source")``);
- **excess loss** per domain = mean over its documents of
  (reference NLL − domain NLL), floored at 0 exactly like the paper's
  clipped excess (their eq. 2: ``max(0, ℓ_ref − ℓ_proxy)`` per domain);
- **weights** = softmax of the excess losses (temperature 1; the paper's
  exponentiated-gradient update with one step from uniform).

This is NOT the q87 temperature mixture (w ∝ tokens^0.7 — a size heuristic):
DoReMi weights respond to the CONTENT of each domain relative to the rest of
the corpus, not its volume.

Scale shape: both LMs come from map-side-combinable count aggregates over one
pair explosion (cardinality ≤ vocab², keyed by source for the domain side);
the per-document score join is one shuffle on doc_id; everything after runs
on the |sources|-row aggregate. Cross-engine determinism: per-document scores
are decimal-pinned before the per-domain mean (exact decimal totals, one
division), the excess is rounded before exp(), and each exp() is rounded to
the 1e-12 grid and decimal-pinned before the softmax denominator sum — float
summation order never reaches any output digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def doremi_weights(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
    persist: bool = True,
) -> DataFrame:
    """Per-domain mixture weights: ``domain, n_docs, loss_ref, loss_dom,
    excess, weight`` (weight = softmax over domains of the clipped excess
    loss). One row per domain.

    Both models come from ONE pinned bigram stream (the reference counts
    drop the domain key, the domain counts keep it) — the scoring semantics
    are exactly ``functions.text.bigram_logprob_scores`` (q125), fused so
    the corpus is tokenized and exploded once instead of once per model."""
    from .session_cache import keep_persisted  # noqa: PLC0415

    # NULL domains must not silently vanish: every downstream step is a
    # domain-keyed equi-join (domain model counts, per-doc score join) and
    # equi-joins drop NULL keys — a corpus with NULL `domain_col` would lose
    # those docs from the weight computation with no warning. Coalesce to a
    # sentinel domain up front and map it back to NULL in the output row, so
    # NULL is just another domain.
    _null_dom = "\x00__null_domain__"
    toked = docs.select(
        id_col,
        F.coalesce(F.col(domain_col), F.lit(_null_dom)).alias(domain_col),
        tokens(F.lower(F.col(text_col))).alias("_t"),
    )
    # THREE consumers of the tokenized corpus (the pairs derivation + the
    # two vocab branches) — pin it so the corpus is tokenized once, not once
    # per consumer.
    if persist:
        toked = keep_persisted(toked, "doremi_toked")
    pairs = (
        toked.filter(F.size("_t") >= 2)
        .select(
            id_col,
            domain_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at("_t", i).alias("a"),
                        F.element_at("_t", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        .select(id_col, domain_col, "p.a", "p.b")
    )
    # FIVE consumers (two models × bigram/left-unigram counts + the scored
    # stream) — pin the exploded stream too; it is derived from the pinned
    # `toked` but each count branch would still re-explode it otherwise.
    # persist=False for scaling probes (a pin turns the second warm rep into
    # a cache scan).
    if persist:
        pairs = keep_persisted(pairs, "doremi_pairs")

    lp = F.log(
        (F.col("n2") + 1).cast("double") / (F.col("n1") + F.col("v"))
    ).cast("decimal(20,12)")

    def scores(g: list, out: str) -> DataFrame:
        c2 = pairs.groupBy(*g, "a", "b").agg(F.count(F.lit(1)).alias("n2"))
        c1 = pairs.groupBy(*g, "a").agg(F.count(F.lit(1)).alias("n1"))
        vocab = (
            toked.select(*g, F.explode("_t").alias("w"))
            .groupBy(*g)
            .agg(F.countDistinct("w").alias("v"))
        )
        scored = pairs.join(c2, [*g, "a", "b"]).join(c1, [*g, "a"])
        scored = (
            scored.join(F.broadcast(vocab), g)
            if g
            else scored.crossJoin(F.broadcast(vocab))
        )
        return scored.groupBy(id_col, *g).agg(
            F.round(
                F.sum(lp).cast("double") / F.count(F.lit(1)), 4
            ).alias(out)
        )

    ref = scores([], "_lp_ref")
    dom = scores([domain_col], "_lp_dom")
    per_doc = dom.join(ref, id_col)
    # NLL = -mean log-prob; scores are already 4-decimal — pin to DECIMAL so
    # the per-domain total is exact regardless of partition/summation order
    per = per_doc.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            -F.sum(F.col("_lp_ref").cast("decimal(10,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("loss_ref"),
        F.round(
            -F.sum(F.col("_lp_dom").cast("decimal(10,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("loss_dom"),
    )
    ex = per.withColumn(
        "excess", F.round(F.greatest(F.col("loss_ref") - F.col("loss_dom"), F.lit(0.0)), 6)
    )
    e = ex.withColumn(
        "_e", F.round(F.exp("excess"), 12).cast("decimal(20,12)")
    )
    # softmax denominator over the |domains|-row aggregate — the single
    # partition here holds ~20 rows, not the corpus
    w = Window.partitionBy()
    return e.select(
        # map the NULL-domain sentinel back so callers see their own key
        F.when(F.col(domain_col) == _null_dom, F.lit(None))
        .otherwise(F.col(domain_col))
        .alias(domain_col),
        F.col("n_docs").cast("long").alias("n_docs"),
        "loss_ref",
        "loss_dom",
        "excess",
        F.round(
            F.col("_e").cast("double") / F.sum("_e").over(w).cast("double"), 6
        ).alias("weight"),
    )
