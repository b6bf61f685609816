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


# --------------------------------------------------------------------------
# q168 — DoReMi-lite domain reweighting (arXiv:2305.10429)
# --------------------------------------------------------------------------

def q168_doremi_weights(spark, sf_dir):
    """DoReMi-lite mixture weights per source (operators/doremi.py): excess
    loss of the corpus-global bigram reference LM over each source's own
    domain LM, clipped at 0 (the paper's eq. 2), softmaxed into weights.
    Content-aware domain weighting — NOT q87's size-based temperature
    mixture. Both LMs are count-table aggregates; everything after the
    per-doc score join runs on the |sources|-row aggregate."""
    from ..operators.doremi import doremi_weights  # noqa: PLC0415

    return doremi_weights(_t(spark, sf_dir, "documents"))


Q168_SQL = """
WITH toks AS (
  -- engine parity (operators/doremi.py): NULL domains coalesce to a
  -- sentinel up front (equi-joins would silently drop them) and map back
  -- to NULL in the output row
  SELECT doc_id, coalesce(source, chr(0) || '__null_domain__') AS source,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x != '') AS t
  FROM documents
), pairs AS (
  SELECT doc_id, source, t[i] AS a, t[i + 1] AS b
  FROM (SELECT doc_id, source, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)
), g2 AS (
  SELECT a, b, count(*) AS n2 FROM pairs GROUP BY 1, 2
), g1 AS (
  SELECT a, count(*) AS n1 FROM pairs GROUP BY 1
), gv AS (
  SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)
), gdoc AS (
  SELECT p.doc_id,
         round(CAST(sum(CAST(ln(CAST(g2.n2 + 1 AS DOUBLE) / (g1.n1 + gv.v)) AS DECIMAL(20,12))) AS DOUBLE)
               / count(*), 4) AS lp_ref
  FROM pairs p
  JOIN g2 ON p.a = g2.a AND p.b = g2.b
  JOIN g1 ON p.a = g1.a
  CROSS JOIN gv
  GROUP BY 1
), s2 AS (
  SELECT source, a, b, count(*) AS n2 FROM pairs GROUP BY 1, 2, 3
), s1 AS (
  SELECT source, a, count(*) AS n1 FROM pairs GROUP BY 1, 2
), sv AS (
  SELECT source, count(DISTINCT w) AS v
  FROM (SELECT source, unnest(t) AS w FROM toks) GROUP BY 1
), sdoc AS (
  SELECT p.doc_id, p.source,
         round(CAST(sum(CAST(ln(CAST(s2.n2 + 1 AS DOUBLE) / (s1.n1 + sv.v)) AS DECIMAL(20,12))) AS DOUBLE)
               / count(*), 4) AS lp_dom
  FROM pairs p
  JOIN s2 ON p.source = s2.source AND p.a = s2.a AND p.b = s2.b
  JOIN s1 ON p.source = s1.source AND p.a = s1.a
  JOIN sv ON p.source = sv.source
  GROUP BY 1, 2
), per AS (
  SELECT s.source, count(*) AS n_docs,
         round(-CAST(sum(CAST(g.lp_ref AS DECIMAL(10,4))) AS DOUBLE) / count(*), 6) AS loss_ref,
         round(-CAST(sum(CAST(s.lp_dom AS DECIMAL(10,4))) AS DOUBLE) / count(*), 6) AS loss_dom
  FROM sdoc s JOIN gdoc g ON s.doc_id = g.doc_id
  GROUP BY 1
), ex AS (
  SELECT *, round(greatest(loss_ref - loss_dom, 0), 6) AS excess FROM per
), e AS (
  SELECT *, CAST(round(exp(excess), 12) AS DECIMAL(20,12)) AS _e FROM ex
)
SELECT CASE WHEN source = chr(0) || '__null_domain__' THEN NULL ELSE source END
         AS source,
       CAST(n_docs AS BIGINT) AS n_docs, loss_ref, loss_dom, excess,
       round(CAST(_e AS DOUBLE) / CAST(sum(_e) OVER () AS DOUBLE), 6) AS weight
FROM e
"""

EXT25_REGISTRY["q168_doremi_weights"] = QueryDef(
    q168_doremi_weights, Q168_SQL,
    "LLM-pipeline: DoReMi-lite domain reweighting (arXiv:2305.10429) — "
    "per-source excess loss of the global reference LM over the domain LM, "
    "clipped and softmaxed into mixture weights",
)
