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
