"""Round-11 extension: the CCNet corpus-curation composition.

q167 — CCNet (Wenzek et al. 2019, arXiv:1911.00359), the canonical
       web-corpus recipe: corpus-wide paragraph-level exact dedup →
       language identification on the deduplicated text → per-language
       LM perplexity scoring → head/middle/tail tercile buckets. The
       engine already certifies each ingredient standalone (q71 passage
       windows, q24 lang-ID, q125 bigram LM); q167 certifies the
       COMPOSITION — dedup feeds lang-ID feeds one LM PER LANGUAGE feeds
       threshold bucketing — as one lineage, the way cc_net actually runs.

       Bucketing is by score thresholds computed on the per-(lang, score)
       distribution table (bounded by the 4-decimal score grid ×
       |languages| — broadcastable at any corpus size), NOT a per-doc
       rank window: no full-corpus global sort, and tied scores share a
       bucket exactly as CCNet's percentile cuts do.
"""

from __future__ import annotations

from .queries import _MARKER_SQL, _NORM, QueryDef, _t

EXT25_REGISTRY: dict[str, QueryDef] = {}

_CHUNK = 10  # the q71 paragraph unit (corpus has no newlines), tail-inclusive


def q167_ccnet_buckets(spark, sf_dir):
    """The CCNet pipeline over ``documents`` (pipelines/ccnet.py):
    tail-inclusive 10-token paragraph windows deduplicated corpus-wide
    (keeper = min (doc_id, pos) occurrence — ONE shuffle on the paragraph
    key), documents reassembled from their surviving windows, language
    identified on the DEDUPLICATED text, one add-one bigram LM trained per
    predicted language, and head/middle/tail buckets cut on per-language
    score thresholds joined back broadcast."""
    from ..pipelines.ccnet import ccnet_buckets  # noqa: PLC0415

    return ccnet_buckets(_t(spark, sf_dir, "documents"), chunk=_CHUNK)


def _q167_sql() -> str:
    norm = _NORM.format(c="text")
    lang_case = f"""
         CASE WHEN zh > 0 THEN 'zh' WHEN he > 0 THEN 'he' WHEN ar > 0 THEN 'ar' WHEN ru > 0 THEN 'ru'
              WHEN v_de > v_en AND v_de >= v_fr AND v_de >= v_es THEN 'de'
              WHEN v_fr > v_en AND v_fr >= v_es THEN 'fr'
              WHEN v_es > v_en THEN 'es'
              WHEN v_en > 0 THEN 'en'
              ELSE 'und' END"""
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split({norm}, ' '), t -> t != '') AS t
  FROM documents
), occ AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(t, i * {_CHUNK} + 1, i * {_CHUNK} + {_CHUNK}), ' ') AS chunk
  FROM (SELECT doc_id, t, unnest(range((len(t) + {_CHUNK - 1}) // {_CHUNK})) AS i FROM toks)
), keep AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM occ
), perdoc AS (
  SELECT doc_id,
         count(*) AS n_chunks,
         count(*) FILTER (WHERE rn = 1) AS n_kept,
         string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1) AS kept
  FROM keep GROUP BY doc_id
), alive AS (
  SELECT * FROM perdoc WHERE n_kept >= 1
), votes AS (
  SELECT doc_id, n_chunks, n_kept, kept,
         length(regexp_replace(kept, '[^\\x{{4E00}}-\\x{{9FFF}}]', '', 'g')) AS zh,
         length(regexp_replace(kept, '[^\\x{{0590}}-\\x{{05FF}}]', '', 'g')) AS he,
         length(regexp_replace(kept, '[^\\x{{0600}}-\\x{{06FF}}]', '', 'g')) AS ar,
         length(regexp_replace(kept, '[^\\x{{0400}}-\\x{{04FF}}]', '', 'g')) AS ru,
         len(list_intersect(lt, {_MARKER_SQL['en']})) AS v_en,
         len(list_intersect(lt, {_MARKER_SQL['de']})) AS v_de,
         len(list_intersect(lt, {_MARKER_SQL['fr']})) AS v_fr,
         len(list_intersect(lt, {_MARKER_SQL['es']})) AS v_es
  FROM (SELECT *, list_distinct(list_filter(string_split(kept, ' '), t -> t != '')) AS lt
        FROM alive)
), langd AS (
  SELECT doc_id, n_chunks, n_kept, kept, {lang_case} AS lang_pred
  FROM votes
), ktoks AS (
  SELECT doc_id, lang_pred, list_filter(string_split(kept, ' '), x -> x != '') AS t
  FROM langd
), pairs AS (
  SELECT doc_id, lang_pred, t[i] AS a, t[i + 1] AS b
  FROM (SELECT doc_id, lang_pred, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM ktoks WHERE len(t) >= 2)
), c2 AS (
  SELECT lang_pred, a, b, count(*) AS n2 FROM pairs GROUP BY 1, 2, 3
), c1 AS (
  SELECT lang_pred, a, count(*) AS n1 FROM pairs GROUP BY 1, 2
), v AS (
  SELECT lang_pred, count(DISTINCT w) AS v
  FROM (SELECT lang_pred, unnest(t) AS w FROM ktoks) GROUP BY 1
), lp AS (
  SELECT p.doc_id, p.lang_pred,
         CAST(ln(CAST(c2.n2 + 1 AS DOUBLE) / (c1.n1 + v.v)) AS DECIMAL(20,12)) AS lp
  FROM pairs p
  JOIN c2 ON p.lang_pred = c2.lang_pred AND p.a = c2.a AND p.b = c2.b
  JOIN c1 ON p.lang_pred = c1.lang_pred AND p.a = c1.a
  JOIN v ON p.lang_pred = v.lang_pred
), dscore AS (
  SELECT doc_id, lang_pred, count(*) AS n_bigrams,
         round(CAST(sum(lp) AS DOUBLE) / count(*), 4) AS avg_logprob
  FROM lp GROUP BY 1, 2
), dist AS (
  SELECT lang_pred, avg_logprob AS s, count(*) AS c FROM dscore GROUP BY 1, 2
), cum AS (
  SELECT lang_pred, s,
         coalesce(sum(c) OVER (PARTITION BY lang_pred ORDER BY s DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_gt,
         sum(c) OVER (PARTITION BY lang_pred) AS n
  FROM dist
), buck AS (
  SELECT lang_pred, s,
         CASE WHEN c_gt < (n + 2) // 3 THEN 'head'
              WHEN c_gt < (2 * n + 2) // 3 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM cum
)
SELECT d.doc_id, d.lang_pred,
       CAST(a.n_chunks AS BIGINT) AS n_chunks,
       CAST(a.n_kept AS BIGINT) AS n_kept,
       CAST(d.n_bigrams AS BIGINT) AS n_bigrams,
       d.avg_logprob, b.bucket
FROM dscore d
JOIN langd a ON d.doc_id = a.doc_id
JOIN buck b ON d.lang_pred = b.lang_pred AND d.avg_logprob = b.s
"""


Q167_SQL = _q167_sql()

EXT25_REGISTRY["q167_ccnet_buckets"] = QueryDef(
    q167_ccnet_buckets, Q167_SQL,
    "LLM-pipeline composed: CCNet (arXiv:1911.00359) — corpus-wide paragraph "
    "dedup -> lang-ID on deduped text -> per-language bigram-LM perplexity -> "
    "head/middle/tail threshold buckets, one lineage",
)
