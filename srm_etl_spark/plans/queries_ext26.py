"""Round-12 extension: any-length exact-substring dedup (full suffix-array
semantics).

q169 — maximal duplicated substrings with EXACT token lengths: q109's
       fixed-window form reports the position cover of duplicated >=16-token
       windows; this reports, per maximal run of duplicated windows, the
       exact length of the longest substring that occurs >= 2 times anywhere
       in the corpus (Lee et al. 2022's suffix-array primitive, reduced to
       run-tail prefix grouping on the sparse duplicated surface —
       operators/dedup.py:maximal_repeat_spans).
"""

from __future__ import annotations

from ..operators.dedup import maximal_repeat_spans
from .queries import QueryDef, _t

_L = 16          # window length in whitespace tokens (q109's threshold)
_CAP = 256       # run-tail cap: repeats exact up to 256 + 15 = 271 tokens

EXT26_REGISTRY: dict[str, QueryDef] = {}


def q169_maximal_repeats(spark, sf_dir):
    """Maximal duplicated substrings (any length >= 16 tokens) with exact
    lengths (operators/dedup.py:maximal_repeat_spans; generalizes q109 —
    reference parity anchor: the dedup stage the reference lacks entirely,
    Lee et al. 2022 arXiv:2107.06499 §4 ExactSubstr)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    d = _t(spark, sf_dir, "documents")
    out = maximal_repeat_spans(d, "text", "doc_id", min_tokens=_L, max_run=_CAP)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("max_repeat_tokens").cast("long").alias("max_repeat_tokens"),
    )


Q169_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS t
  FROM documents
), wins AS (
  SELECT doc_id, cs AS s,
         md5(array_to_string(list_slice(t, cs, cs + {_L - 1}), ' ')) AS k
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {_L - 1})) AS cs
        FROM toks WHERE len(t) >= {_L})
), dupk AS (
  SELECT k FROM wins GROUP BY k HAVING count(*) >= 2
), marked AS (
  SELECT w.doc_id, w.s, w.k FROM wins w JOIN dupk USING (k)
), runs AS (
  SELECT doc_id, s, k,
         s - row_number() OVER (PARTITION BY doc_id ORDER BY s) AS g
  FROM marked
), pos AS (
  SELECT doc_id, s, g,
         list(k) OVER (PARTITION BY doc_id, g ORDER BY s
                       ROWS BETWEEN CURRENT ROW AND {_CAP - 1} FOLLOWING) AS tail
  FROM runs
), pref AS (
  SELECT doc_id, s, g, p.m AS m, p.pk AS pk
  FROM pos, UNNEST(list_transform(
         generate_series(1, len(tail)),
         i -> struct_pack(m := i, pk := md5(array_to_string(tail[1:i], '|'))))) AS u(p)
), duppref AS (
  SELECT pk FROM pref GROUP BY pk HAVING count(*) >= 2
), duplen AS (
  SELECT p.doc_id, p.s, p.g, max(p.m) AS dl
  FROM pref p JOIN duppref USING (pk)
  GROUP BY p.doc_id, p.s, p.g
)
SELECT doc_id,
       CAST(min(s) AS BIGINT) AS span_start,
       CAST(max(s) + {_L - 1} AS BIGINT) AS span_end,
       CAST(max(s) + {_L - 1} - min(s) + 1 AS BIGINT) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(max(dl) + {_L - 1} AS BIGINT) AS max_repeat_tokens
FROM duplen
GROUP BY doc_id, g
"""


EXT26_REGISTRY["q169_maximal_repeats"] = QueryDef(
    q169_maximal_repeats, Q169_SQL,
    "LLM-pipeline: any-length maximal duplicated substrings (suffix-array semantics)",
)


def q170_exact_decontaminate(spark, sf_dir):
    """Any-length exact-substring decontamination of a training corpus vs a
    held-out eval slice (operators/decontaminate.py:
    exact_substring_decontaminate — Lee et al. 2022 §6.2 train-test leakage,
    the surgical span-cut form of GPT-3's n-gram document drop). Eval =
    doc_id % 7 == 0 (the slice with measurable leakage at all three SFs);
    spans of >= 16 tokens occurring verbatim in the eval set are cut out of
    the train docs, with per-doc span/token counts carried alongside."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from ..operators.decontaminate import exact_substring_decontaminate  # noqa: PLC0415

    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 7 == 0)
    train = d.filter(F.col("doc_id") % 7 != 0)
    out = exact_substring_decontaminate(train, ev, "text", "doc_id", min_tokens=_L)
    return out.select(
        "doc_id",
        F.col("n_contam_spans").cast("long").alias("n_contam_spans"),
        F.col("contam_tokens").cast("long").alias("contam_tokens"),
        "clean_text",
    )


Q170_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS t
  FROM documents
), wins AS (
  SELECT doc_id, cs AS s,
         md5(array_to_string(list_slice(t, cs, cs + {_L - 1}), ' ')) AS k
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {_L - 1})) AS cs
        FROM toks WHERE len(t) >= {_L})
), evk AS (
  SELECT DISTINCT k FROM wins WHERE doc_id % 7 = 0
), marked AS (
  SELECT w.doc_id, w.s FROM wins w JOIN evk USING (k) WHERE w.doc_id % 7 != 0
), flagged AS (
  SELECT doc_id, s,
         CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) > {_L}
              THEN 1 ELSE 0 END AS brk
  FROM marked
), isl AS (
  SELECT doc_id, s,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), spans AS (
  SELECT doc_id, min(s) AS ss, max(s) + {_L - 1} AS se
  FROM isl GROUP BY doc_id, island
), per_doc AS (
  SELECT doc_id, count(*) AS n_spans, sum(se - ss + 1) AS ctok FROM spans GROUP BY doc_id
), exploded AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
  FROM toks WHERE doc_id % 7 != 0
), kept AS (
  SELECT e.doc_id, e.tok, e.pos
  FROM exploded e
  WHERE NOT EXISTS (SELECT 1 FROM spans s2
                    WHERE s2.doc_id = e.doc_id AND e.pos BETWEEN s2.ss AND s2.se)
), rejoined AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_contam_spans,
       CAST(coalesce(p.ctok, 0) AS BIGINT) AS contam_tokens,
       CASE WHEN p.doc_id IS NULL THEN d.text ELSE coalesce(r.clean, '') END AS clean_text
FROM documents d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN rejoined r USING (doc_id)
WHERE d.doc_id % 7 != 0
"""


EXT26_REGISTRY["q170_exact_decontaminate"] = QueryDef(
    q170_exact_decontaminate, Q170_SQL,
    "LLM-pipeline: any-length exact-substring decontamination vs an eval set",
)
