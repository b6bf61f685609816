"""Round-4 extension queries, part 6: exact-substring dedup (suffix-dedup
approximation).

q109 — duplicated-span report: every 16-token window hashed, windows seen
       >= 2 times anywhere mark positions, positions coalesce into maximal
       per-document spans (the fixed-window form of Lee et al. 2022's
       suffix-array substring dedup).
q110 — the corpus with those spans CUT OUT: the actual training-data
       transformation the span report exists to drive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import duplicate_substring_spans, remove_duplicate_spans
from .queries import QueryDef, _t

_L = 16  # window length in whitespace tokens (Lee et al. use 50 BPE tokens)


def q109_substring_spans(spark, sf_dir):
    """Maximal duplicated >=16-token spans per document
    (operators/dedup.py:duplicate_substring_spans). One corpus shuffle keyed
    by window hash; md5 window keys so the oracle groups the identical keys."""
    d = _t(spark, sf_dir, "documents")
    out = duplicate_substring_spans(
        d, "text", "doc_id", min_tokens=_L, hash_family="md5"
    )
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
        F.col("n_windows").cast("long").alias("n_windows"),
    )


_Q109_CORE = f"""
toks AS (
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
  SELECT w.doc_id, w.s FROM wins w JOIN dupk USING (k)
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
  SELECT doc_id, min(s) AS ss, max(s) + {_L - 1} AS se, count(*) AS nw
  FROM isl GROUP BY doc_id, island
)
"""

Q109_SQL = f"""
WITH {_Q109_CORE}
SELECT doc_id, CAST(ss AS BIGINT) AS span_start, CAST(se AS BIGINT) AS span_end,
       CAST(se - ss + 1 AS BIGINT) AS span_tokens, CAST(nw AS BIGINT) AS n_windows
FROM spans
"""


def q110_substring_dedup_clean(spark, sf_dir):
    """The corpus after cutting every duplicated span found by q109
    (operators/dedup.py:remove_duplicate_spans): tokens inside spans drop,
    survivors re-join single-spaced; untouched documents keep their text
    verbatim."""
    d = _t(spark, sf_dir, "documents")
    spans = duplicate_substring_spans(
        d, "text", "doc_id", min_tokens=_L, hash_family="md5"
    )
    out = remove_duplicate_spans(d, spans, "text", "doc_id")
    return out.select("doc_id", "clean_text")


Q110_SQL = f"""
WITH {_Q109_CORE},
spanned AS (SELECT DISTINCT doc_id FROM spans),
exploded AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM toks
), kept AS (
  SELECT e.doc_id, e.tok, e.pos
  FROM exploded e
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = e.doc_id AND e.pos BETWEEN s.ss AND s.se)
), rejoined AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN sp.doc_id IS NULL THEN d.text ELSE coalesce(r.clean, '') END AS clean_text
FROM documents d
LEFT JOIN spanned sp USING (doc_id)
LEFT JOIN rejoined r USING (doc_id)
"""


EXT11_REGISTRY = {
    "q109_substring_spans": QueryDef(
        q109_substring_spans, Q109_SQL,
        "LLM-pipeline: exact duplicated-substring spans (suffix-dedup approximation)",
    ),
    "q110_substring_dedup_clean": QueryDef(
        q110_substring_dedup_clean, Q110_SQL,
        "LLM-pipeline: corpus with duplicated spans removed",
    ),
}
