"""Auto-tagging: rule-driven taxonomy tag injection (reference
``operators/derive/autotagging.py:7-52``).

The reference iterates rules per row in Python: a rule carries a Hebrew
``query`` string, the subset of text fields to scan, and the
situation/response ids to add on a match. Match semantics (``:31-33``):
``value.endswith(query) or (query + ' ') in value`` — i.e. the query appears
as a word that is not a strict prefix of a longer word. On match, the rule's
ids are appended (first-occurrence order, no duplicates) to the row's
``situation_ids``/``response_ids`` and to an ``auto_tagged`` audit column
(``:36-46``).

Spark shape: the rule table is tiny and broadcast; matching is ONE
broadcast-nested-loop join with a native predicate (no per-row Python), and
the order-sensitive merge is expression-level — matched rules are collected,
sorted by rule index, flattened, and folded with ``array_distinct`` (which
keeps first occurrence, exactly the reference's append-if-absent loop). The
fan-out is rows × matched-rules only; unmatched rows skip the aggregate
entirely via the left join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TAGGABLE_FIELDS = ("organization_name", "organization_purpose", "service_name")


def _field_match(value: Column, query: Column) -> Column:
    """Reference match rule (autotagging.py:31-33): suffix or word-boundary
    containment."""
    return value.isNotNull() & (
        value.endswith(query) | value.contains(F.concat(query, F.lit(" ")))
    )


def apply_auto_tagging(
    df: DataFrame,
    rules: DataFrame,
    field_cols: tuple[str, ...] = TAGGABLE_FIELDS,
    key_col: str = "card_key",
) -> DataFrame:
    """Inject rule tags into ``situation_ids``/``response_ids`` + ``auto_tagged``.

    ``rules`` columns: ``rule_idx`` (application order), ``query`` (string),
    ``fields`` (array<string> ⊆ ``field_cols``), ``situation_ids``,
    ``response_ids`` (array<string>, possibly empty).
    """
    match_any = None
    for fc in field_cols:
        c = F.when(
            F.array_contains(F.col("r.fields"), fc),
            _field_match(F.col(f"d.{fc}"), F.col("r.query")),
        ).otherwise(F.lit(False))
        match_any = c if match_any is None else (match_any | c)

    d, r = df.alias("d"), F.broadcast(rules).alias("r")
    matched = d.join(r, match_any, "inner").select(
        F.col(f"d.{key_col}").alias("_k"),
        F.struct(
            F.col("r.rule_idx").alias("i"),
            F.coalesce(F.col("r.situation_ids"), F.array()).alias("s"),
            F.coalesce(F.col("r.response_ids"), F.array()).alias("t"),
        ).alias("_m"),
    )
    # rule order is load order (reference iterates rules in sequence) —
    # sort_array on (rule_idx, ...) restores it after the shuffle
    per_row = matched.groupBy("_k").agg(
        F.sort_array(F.collect_list("_m")).alias("_ms")
    )
    new_s = F.expr("flatten(transform(_ms, m -> m.s))")
    new_t = F.expr("flatten(transform(_ms, m -> m.t))")
    new_all = F.expr("flatten(transform(_ms, m -> concat(m.s, m.t)))")
    tagged = per_row.select(
        "_k",
        new_s.alias("_new_s"),
        new_t.alias("_new_t"),
        # auto_tagged records every matched tag once, in rule order —
        # including tags the row already carried (reference :38-46)
        F.array_distinct(new_all).alias("_auto"),
    )
    out = df.join(tagged, df[key_col] == tagged._k, "left")
    merge = (
        lambda orig, new: F.array_distinct(
            F.concat(
                F.coalesce(F.col(orig), F.array()),
                F.coalesce(new, F.array()),
            )
        )
    )
    return (
        out.withColumn("situation_ids", merge("situation_ids", F.col("_new_s")))
        .withColumn("response_ids", merge("response_ids", F.col("_new_t")))
        .withColumn("auto_tagged", F.coalesce(F.col("_auto"), F.array().cast("array<string>")))
        .drop("_k", "_new_s", "_new_t", "_auto")
    )
