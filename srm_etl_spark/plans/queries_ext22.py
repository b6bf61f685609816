"""Round-9 extension: the training-data pipeline as ONE composed,
phase-gated certification.

q160 — the full LLM training-corpus flow in a single lineage: held-out
       eval split → exact dedup → MinHash-LSH near-dup removal → C4/Gopher
       quality gate → n-gram decontamination vs the eval slice →
       per-(source, lang) quality quota → per-language sequence packing.
       Every stage already certifies standalone (q22/q26/q31-family/q80/
       q81/q76) and two partial compositions exist (q78 dedup→quality→pack,
       q100 dedup→decontam→quota), but those emit per-stage COUNTS; this
       emits every stage's FULL ROW-SET as phase-labeled (key, sig) rows —
       the q158 pattern — so one hash gates the membership of every
       intermediate corpus AND the handoffs between stages (near-dup runs
       on exact survivors only, decontamination on quality survivors only,
       the quota on decontaminated docs only, packing on the quota
       winners).

Scale shape: each stage is the already-audited operator (dedup = one
content-hash shuffle; LSH = banded equi-join, never corpus²; the quality
gate is a map; decontamination broadcasts only the eval gram set; quota and
packing are one window each). The five intermediate frames are persisted
once and every phase leg reuses them — the union adds no recomputation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _NORM, _STOP_SQL, QueryDef, _t
from .queries_ext6 import _BPE_SQL
from .queries_ext21 import _s

EXT22_REGISTRY: dict[str, QueryDef] = {}


def q160_training_corpus_staged(spark, sf_dir):
    """One lineage from raw documents to packed training sequences, every
    stage's row-set hash-gated (docstring at module top; reference parity
    per stage: dedup/LSH `operators/dedup.py`, quality
    `functions/text.py:with_quality_flags`, decontamination
    `operators/decontaminate.py`, quota `operators/windows.py`, packing
    `operators/packing.py` — the md5 hash family keeps the LSH leg
    oracle-reproducible exactly as q26 does)."""
    from ..pipelines.curation import training_corpus_stages  # noqa: PLC0415

    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 37 == 0)          # held-out benchmark slice
    raw = d.filter(F.col("doc_id") % 37 != 0)         # the ingested corpus
    st = training_corpus_stages(raw, ev)
    exact, near, qual = st["exact"], st["near"], st["quality"]
    clean, kept, seqs = st["clean"], st["kept"], st["seqs"]

    def doc_phase(df, name, *sig_cols):
        return df.select(
            F.lit(name).alias("phase"),
            F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("key"),
            F.concat_ws("|", *[_s(c) for c in sig_cols]).alias("sig"),
        )

    legs = [
        doc_phase(exact, "10_exact", "lang", "source"),
        doc_phase(near, "20_neardup", "lang", "source"),
        doc_phase(qual, "30_quality", "n_tokens"),
        doc_phase(clean, "40_decontam", "lang", "source"),
        doc_phase(kept, "50_quota", "source", "lang", "rank"),
        seqs.select(
            F.lit("60_packed").alias("phase"),
            F.concat(F.lit("p:"), _s("lang"), F.lit(":"), F.col("seq_id").cast("string")).alias("key"),
            F.concat_ws("|", _s("n_docs"), _s("sum_tokens")).alias("sig"),
        ),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# Split into TO_CLEAN / TAIL so q166 can splice the DSIR stage between the
# decontamination and the quota without duplicating any chain literal.
# __QSRC__ is a sentinel (not .format — the chain text contains regex braces).
_Q160_CTES_TO_CLEAN = f"""raw AS (
  SELECT * FROM documents WHERE doc_id % 37 != 0
), normed AS (
  SELECT doc_id, lang, source, text, {_NORM.format(c='text')} AS norm FROM raw
), exact AS (
  -- keeper assembled as ONE struct (per-column arg_min would skip a NULL
  -- field on the min-id row and frankenrow it from another group member)
  SELECT doc_id, k.lang AS lang, k.source AS source, k.text AS text, norm
  FROM (
    SELECT min(doc_id) AS doc_id,
           arg_min(struct_pack(lang := lang, source := source, text := text),
                   doc_id) AS k,
           norm
    FROM normed GROUP BY norm
  )
), toksrc AS (
  SELECT doc_id, list_filter(string_split(norm, ' '), t -> t != '') AS tok
  FROM exact WHERE norm != ''
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(tok) - 2, 1)),
           i -> array_to_string(tok[i:i+2], ' '))) AS shingles
  FROM toksrc
), slots AS (
  SELECT s.doc_id, g.i, min(md5(CAST(g.i AS VARCHAR) || ':' || us.shingle)) AS mh
  FROM sh s, UNNEST(s.shingles) AS us(shingle), generate_series(0, 15) AS g(i)
  GROUP BY s.doc_id, g.i
), bands AS (
  SELECT doc_id, i // 4 AS band, md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
  FROM slots GROUP BY doc_id, i // 4
), cands AS (
  SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
), losers AS (
  SELECT DISTINCT c.right_id
  FROM cands c
  JOIN sh a ON a.doc_id = c.left_id
  JOIN sh b ON b.doc_id = c.right_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.7
), near AS (
  SELECT e.* FROM exact e LEFT JOIN losers l ON e.doc_id = l.right_id
  WHERE l.right_id IS NULL
), qbase AS (
  SELECT doc_id, lang, source, text, norm,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks,
         length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s]', '', 'g')) AS n_punct
  FROM near
), counted AS (
  SELECT doc_id, lang, source, text, norm, nonspace, n_punct,
         CAST(len(toks) AS INT) AS n_tokens,
         CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS INT) AS total_word_chars,
         CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                              t -> list_contains({_STOP_SQL}, t))) AS INT) AS n_stopwords
  FROM qbase
), quality AS (
  SELECT doc_id, lang, source, text, norm, nonspace, n_punct, n_tokens, total_word_chars
  FROM counted
  WHERE n_tokens >= 50
    AND 3 * n_tokens <= total_word_chars AND total_word_chars <= 10 * n_tokens
    AND n_punct * 10 <= nonspace
    AND n_stopwords >= 2
), evtoks AS (
  SELECT list_filter(string_split({_NORM.format(c='text')}, ' '), t -> t != '') AS t
  FROM documents WHERE doc_id % 37 = 0
), evgrams AS (
  SELECT DISTINCT unnest(
    CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
         ELSE list_distinct(list_transform(
                generate_series(1, greatest(len(t) - 2, 1)),
                i -> array_to_string(list_slice(t, i, i + 2), ' '))) END) AS gram
  FROM evtoks
), corpgrams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(tok) = 0 THEN CAST([] AS VARCHAR[])
         ELSE list_distinct(list_transform(
                generate_series(1, greatest(len(tok) - 2, 1)),
                i -> array_to_string(list_slice(tok, i, i + 2), ' '))) END) AS gram
  FROM (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t != '') AS tok FROM quality)
), dirty AS (
  SELECT c.doc_id FROM corpgrams c JOIN evgrams USING (gram)
  GROUP BY c.doc_id HAVING count(*) >= 2
), clean AS (
  SELECT q.* FROM quality q ANTI JOIN dirty d ON q.doc_id = d.doc_id
)"""

_Q160_TAIL_T = f"""scoreq AS (
  SELECT doc_id, source, lang, text,
    round((
      least(CAST(n_tokens AS DOUBLE) / 50, 1.0)
      + 1.0 - least(CASE WHEN nonspace = 0 THEN 0.0
                         ELSE CAST(n_punct AS DOUBLE) / nonspace END * 4, 1.0)
      + CASE WHEN n_tokens = 0 THEN 0.0
             ELSE CASE WHEN CAST(total_word_chars AS DOUBLE) / n_tokens
                            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END END
    ) / 3.0, 4) AS quality
  FROM __QSRC__
), kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source, lang
                                 ORDER BY quality DESC, doc_id) AS rank
    FROM scoreq
  ) WHERE rank <= 15
), sized AS (
  SELECT doc_id, lang, {_BPE_SQL.format(c='text')} AS nt FROM kept
), packed AS (
  SELECT lang, doc_id, nt,
         CAST(floor((sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt)
                    / 2048) AS BIGINT) AS seq_id
  FROM sized
), seqs AS (
  SELECT lang, seq_id, count(*) AS n_docs,
         CAST(coalesce(sum(nt), 0) AS BIGINT) AS sum_tokens
  FROM packed GROUP BY lang, seq_id
)"""

# phases shared by q160 and (with the DSIR leg added) q166
_Q160_PHASES = """
SELECT '10_exact' AS phase, 'd:' || CAST(doc_id AS VARCHAR) AS key,
       coalesce(lang, '') || '|' || coalesce(source, '') AS sig FROM exact
UNION ALL
SELECT '20_neardup', 'd:' || CAST(doc_id AS VARCHAR),
       coalesce(lang, '') || '|' || coalesce(source, '') FROM near
UNION ALL
SELECT '30_quality', 'd:' || CAST(doc_id AS VARCHAR),
       CAST(n_tokens AS VARCHAR) FROM quality
UNION ALL
SELECT '40_decontam', 'd:' || CAST(doc_id AS VARCHAR),
       coalesce(lang, '') || '|' || coalesce(source, '') FROM clean
UNION ALL
SELECT '50_quota', 'd:' || CAST(doc_id AS VARCHAR),
       coalesce(source, '') || '|' || coalesce(lang, '') || '|' || CAST(rank AS VARCHAR) FROM kept
UNION ALL
SELECT '60_packed', 'p:' || coalesce(lang, '') || ':' || CAST(seq_id AS VARCHAR),
       CAST(n_docs AS VARCHAR) || '|' || CAST(sum_tokens AS VARCHAR) FROM seqs
"""

Q160_SQL = (
    "WITH " + _Q160_CTES_TO_CLEAN + ", "
    + _Q160_TAIL_T.replace("__QSRC__", "clean")
    + _Q160_PHASES
)


EXT22_REGISTRY["q160_training_corpus_staged"] = QueryDef(
    q160_training_corpus_staged, Q160_SQL,
    "LLM-pipeline composed: eval split -> exact dedup -> LSH near-dup -> "
    "quality -> decontam -> quota -> packing, every stage's row-set phase-gated",
)
