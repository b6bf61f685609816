"""Benchmark: the did-you-mean decision kernel, Spark-first.

Reference ``operators/benchmark/__init__.py:42-68`` (``search_dym``): the
HTTP transport around it is an S-layer concern covered by the connector
suite; the pure decision logic — which possible_autocomplete candidate, if
any, becomes the did-you-mean suggestion — is this one native expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DYM_SHARD_SIZE = 50


def dym_rerank(pa: Column, total: Column) -> Column:
    """``search_dym``'s possible_autocomplete choice over
    ``pa: array<struct<key string, doc_count double>>``:

    - total < 10 → no suggestion;
    - every non-best candidate's doc_count scales by
      ``log(len(key)) / log(len(best.key))`` (longer keys get a boost
      relative to the incumbent);
    - sort by scaled doc_count descending — STABLE like the reference's
      ``sorted(..., reverse=True)``: exact ties keep the earlier candidate
      (the struct carries a negated-index tiebreak);
    - the winner stands only if ``threshold < doc_count <= SHARD_SIZE``
      where ``threshold = min(SHARD_SIZE, total) / 3``.
    """
    best_factor = F.log(F.length(F.element_at(pa, 1)["key"]))
    scaled = F.transform(
        pa,
        lambda x, i: F.struct(
            F.when(i == 0, x["doc_count"].cast("double")).otherwise(
                x["doc_count"] * F.log(F.length(x["key"])) / best_factor
            ).alias("doc_count"),
            (-i).alias("nidx"),  # ties resolve to the EARLIEST candidate
            x["key"].alias("key"),
        ),
    )
    ranked = F.reverse(F.array_sort(scaled))
    best = F.element_at(ranked, 1)
    threshold = F.least(F.lit(DYM_SHARD_SIZE), total) / 3
    ok = (
        (total >= 10)
        & (best["doc_count"] <= DYM_SHARD_SIZE)
        & (best["doc_count"] > threshold)
    )
    return F.when((F.size(pa) > 0) & ok, best["key"])
