"""Round-4 extension queries: the composed flagship surfaces.

q74 — the autocomplete corpus flow end-to-end (reference
      ``operators/derive/autocomplete.py:165-207``): template explode (U5) →
      first-per-group ordered by importance (W2) → fuzzy city-bounds join
      (J7) → (ln(count)+1)² score.
q75 — the full card_data column surface (reference ``to_dp.py:723-915`` +
      ``to_es.py:24-59``): RSScoreCalc per-card cap/resort, response-category
      mode, card_score, address/org-name parts, point_id/coords/geometry
      validation — the columns VERDICT r3 flagged as the biggest composition
      gap, each oracle-checked here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _NORM, _STOP_SQL, QueryDef, _DERIVE_CTES, _t


# --------------------------------------------------------------------------
# q75 — full card surface (A10 application + to_dp.py:835-915 + card_score)
# --------------------------------------------------------------------------

# A cap of 3.0 (not the reference's 30) so the pop-while-over-cap loop has
# rows to trim at this corpus size: fixture card totals span ~2.2-4.1, so
# both the "kept whole" and the "top situation popped" paths execute.
_Q75_MAX_SCORE = 3.0


def q75_card_surface(spark, sf_dir):
    """Full card_data surface. All heavy lifting is in
    pipelines/derive.py:card_data_full; this picks the oracle-checkable
    columns (arrays emitted as joined strings, doubles rounded)."""
    from ..pipelines.derive import card_data_full, run_derive  # noqa: PLC0415

    ft = run_derive(spark, sf_dir)["flat_table"]
    # rs_mode="per_row" — q75 is the full-surface consumer AND the oracle
    # gate for the shuffle-free formulation (folded score-map literal,
    # per-row cap/resort/mode); partial-surface consumers use the default
    # joined formulation, which Catalyst prunes
    full = card_data_full(ft, max_score=_Q75_MAX_SCORE, rs_mode="per_row")
    return full.select(
        "card_key",
        "rs_score",
        "situations_scored",
        "situation_scores_micro",
        "response_category",
        "card_score",
        "address_primary",
        "address_secondary",
        "org_name_primary",
        "org_name_secondary",
        "point_id",
        "coords",
        "national_service_details",
        "organization_resolved_name",
        "collapse_key",
        "possible_autocomplete",
        "responses_reordered",
    )


_Q75_CARD_SCORE_SQL = """
round(
  greatest(
    (CASE WHEN f.service_id LIKE 'meser-%' THEN 1.0 ELSE 10.0 END)
    * (CASE WHEN f.service_description IS NOT NULL AND length(f.service_description) > 5
            THEN 10.0 ELSE 1.0 END)
    * (CASE WHEN coalesce(f.national_service, false)
            THEN 10.0 * (CASE WHEN f.organization_phone IS NOT NULL
                              AND (length(f.organization_phone) <= 5 OR f.organization_phone LIKE '1%')
                         THEN 5.0 ELSE 1.0 END)
            ELSE (CASE WHEN bc.bc > 100 THEN bc.bc / 10.0 ELSE sqrt(bc.bc) END)
       END)
    * (CASE WHEN f.organization_kind IN ('משרד ממשלתי', 'רשות מקומית', 'תאגיד סטטוטורי')
            THEN 5.0 ELSE 1.0 END),
    1.0
  ) * pow(10.0, coalesce(f.service_boost, 0.0)),
6)
"""

Q75_SQL = _DERIVE_CTES + f"""
, ftf AS (
  SELECT f.branch_id || f.service_id AS card_key,
         f.service_id, f.service_name,
         f.description AS service_description, f.boost AS service_boost,
         fb.branch_city, fb.branch_address,
         fb.organization_name, fb.organization_short_name,
         fb.organization_kind, fb.organization_phone,
         fb.organization_branch_count, fb.national_service, fb.lat, fb.lon,
         [f.response0, f.response1] AS response_ids,
         [f.situation0, f.situation1] AS situation_ids
  FROM fs f JOIN fb ON f.branch_id = fb.branch_id
), rs_pairs AS (
  SELECT f.card_key, len(f.response_ids) AS nr,
         s.s AS situation_id, list_position(f.situation_ids, s.s) AS s_pos,
         r.r AS response_id
  FROM ftf f
  CROSS JOIN unnest(f.situation_ids) AS s(s)
  CROSS JOIN unnest(f.response_ids) AS r(r)
), rs_freq AS (
  SELECT response_id, situation_id, count(*) AS fr
  FROM rs_pairs GROUP BY 1, 2
), rs_tbl AS (
  SELECT response_id, situation_id,
         ln(CAST(sum(fr) OVER (PARTITION BY response_id) AS DOUBLE) / fr) AS score
  FROM rs_freq
), rs_sit AS (
  SELECT p.card_key, p.situation_id, min(p.s_pos) AS s_pos,
         sum(coalesce(t.score, 0)) / any_value(p.nr) AS s_score
  FROM rs_pairs p LEFT JOIN rs_tbl t USING (response_id, situation_id)
  GROUP BY 1, 2
), rs_kept AS (
  SELECT *,
         sum(s_score) OVER (PARTITION BY card_key)
         - sum(s_score) OVER (PARTITION BY card_key ORDER BY s_score DESC, s_pos ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + s_score AS sfx
  FROM rs_sit
  QUALIFY sfx <= {_Q75_MAX_SCORE}
), rs AS (
  SELECT card_key, round(sum(s_score), 6) AS rs_score,
         array_to_string(list(situation_id ORDER BY s_score DESC, s_pos ASC), ',') AS situations_scored,
         array_to_string(list(CAST(CAST(round(s_score * 1e6) AS BIGINT) AS VARCHAR)
                              ORDER BY s_score DESC, s_pos ASC), ',') AS situation_scores_micro
  FROM rs_kept GROUP BY card_key
), cat AS (
  SELECT f.card_key, string_split(r.r, ':')[2] AS category,
         list_position(f.response_ids, r.r) AS r_pos
  FROM ftf f CROSS JOIN unnest(f.response_ids) AS r(r)
), catc AS (
  SELECT card_key, category, count(*) AS n, min(r_pos) AS first_pos
  FROM cat GROUP BY 1, 2
), cmode AS (
  SELECT card_key, category AS response_category
  FROM catc
  QUALIFY row_number() OVER (PARTITION BY card_key
                             ORDER BY n DESC, first_pos ASC, category ASC) = 1
)
SELECT f.card_key,
       coalesce(r.rs_score, 0.0) AS rs_score,
       coalesce(r.situations_scored, '') AS situations_scored,
       coalesce(r.situation_scores_micro, '') AS situation_scores_micro,
       m.response_category,
       {_Q75_CARD_SCORE_SQL} AS card_score,
       CASE WHEN coalesce(f.national_service, false) THEN 'שירות ארצי'
            ELSE f.branch_city END AS address_primary,
       CASE WHEN coalesce(f.national_service, false) THEN NULL
            ELSE left(f.branch_address, length(f.branch_address) - length(f.branch_city) - 1)
       END AS address_secondary,
       'Supplier' AS org_name_primary,
       nullif(trim(' ' || substr(f.organization_name, 9), ' -,'), '') AS org_name_secondary,
       CASE WHEN coalesce(f.national_service, false) THEN 'national_service'
            ELSE replace(printf('%08.5f%08.5f', f.lon, f.lat), '.', '') END AS point_id,
       printf('[%.5f,%.5f]', f.lon, f.lat) AS coords,
       CASE WHEN coalesce(f.national_service, false) THEN 'ארצי' END AS national_service_details,
       f.organization_short_name || ',' || f.organization_name AS organization_resolved_name,
       trim(f.service_name || ' ' || coalesce(f.service_description, '')) AS collapse_key,
       array_to_string(list_sort(list_distinct(list_filter(flatten(
         list_transform(f.response_ids, r -> list_concat(list_concat(
           [r],
           flatten(list_transform(f.situation_ids, s -> [
             CASE WHEN NOT list_contains(['human_situations:language:hebrew_speaking',
                                          'human_situations:age_group:adults'], s)
                   AND NOT list_contains(['age_group', 'language'], string_split(s, ':')[2])
                  THEN s END,
             CASE WHEN NOT list_contains(['human_situations:language:hebrew_speaking',
                                          'human_situations:age_group:adults'], s)
                  THEN r || ' עבור ' || s END,
             CASE WHEN f.branch_city IS NOT NULL
                  THEN 'שירותים עבור ' || s || ' ב' || f.branch_city END,
             CASE WHEN f.branch_city IS NOT NULL
                  THEN r || ' עבור ' || s || ' ב' || f.branch_city END]))),
           CASE WHEN f.branch_city IS NOT NULL
                THEN [r || ' ב' || f.branch_city] ELSE [] END))),
         x -> x IS NOT NULL))), '|') AS possible_autocomplete,
       array_to_string(list_concat(
         list_filter(f.response_ids, r -> string_split(r, ':')[2] IS NOT DISTINCT FROM m.response_category),
         list_filter(f.response_ids, r -> string_split(r, ':')[2] IS DISTINCT FROM m.response_category)
       ), ',') AS responses_reordered
FROM ftf f
LEFT JOIN rs r USING (card_key)
LEFT JOIN cmode m USING (card_key)
CROSS JOIN LATERAL (SELECT CASE WHEN coalesce(f.organization_branch_count, 1) <= 0 THEN 1.0
                                ELSE CAST(coalesce(f.organization_branch_count, 1) AS DOUBLE) END AS bc) AS bc
WHERE (f.lon > 33.0 AND f.lon < 37.0 AND f.lat > 29.3 AND f.lat < 33.3)
   OR coalesce(f.national_service, false)
"""


# --------------------------------------------------------------------------
# q74 — autocomplete corpus end-to-end (U5 → W2 → J7 → score)
# --------------------------------------------------------------------------

def q74_autocomplete_flow(spark, sf_dir):
    """The composed autocomplete flow (pipelines/autocomplete.py): template
    explode over the card corpus, first-per-query in importance order with
    count/low aggregates, fuzzy city-bounds lookup, (ln(n)+1)^2 scoring."""
    from ..pipelines import staging_fixtures as FIX  # noqa: PLC0415
    from ..pipelines.autocomplete import (  # noqa: PLC0415
        autocomplete_corpus,
        autocomplete_input,
        city_bounds,
    )
    from ..pipelines.derive import run_derive  # noqa: PLC0415

    ft = run_derive(spark, sf_dir)["flat_table"]
    cards = autocomplete_input(ft)
    bounds = city_bounds(FIX.locations(spark, sf_dir))
    return autocomplete_corpus(cards, bounds)


Q74_SQL = _DERIVE_CTES + """
, ac_cards AS (
  SELECT [f.response0, f.response1] AS direct_responses,
         [f.situation0, f.situation1] AS direct_situations,
         list_sort(list_distinct(list_concat(
           list_transform(range(2, len(string_split(f.response0, ':')) + 1),
                          i -> array_to_string(string_split(f.response0, ':')[1:i], ':')),
           list_transform(range(2, len(string_split(f.response1, ':')) + 1),
                          i -> array_to_string(string_split(f.response1, ':')[1:i], ':'))))) AS responses_parents,
         list_sort(list_distinct(list_concat(
           list_transform(range(2, len(string_split(f.situation0, ':')) + 1),
                          i -> array_to_string(string_split(f.situation0, ':')[1:i], ':')),
           list_transform(range(2, len(string_split(f.situation1, ':')) + 1),
                          i -> array_to_string(string_split(f.situation1, ':')[1:i], ':'))))) AS situations_parents,
         coalesce(fb.organization_short_name, fb.organization_name) AS org_name,
         fb.branch_city, fb.organization_branch_count
  FROM fs f JOIN fb ON f.branch_id = fb.branch_id
  WHERE (fb.lon > 33.0 AND fb.lon < 37.0 AND fb.lat > 29.3 AND fb.lat < 33.3)
     OR coalesce(fb.national_service, false)
), tpls AS (
  SELECT * FROM (VALUES
    (0, '{response}', true, false, false, false),
    (1, '{situation}', false, true, false, false),
    (2, '{response} עבור {situation}', true, true, false, false),
    (3, '{org_name}', false, false, true, false),
    (4, '{response} ב{city_name}', true, false, false, true)
  ) AS t(importance, template, has_r, has_s, has_o, has_c)
), ex AS (
  SELECT c.direct_responses, c.direct_situations, c.organization_branch_count,
         t.importance, t.template,
         r.r AS resp, s.s AS sit,
         CASE WHEN t.has_o THEN c.org_name END AS org,
         CASE WHEN t.has_c THEN c.branch_city END AS city
  FROM ac_cards c
  CROSS JOIN tpls t
  CROSS JOIN unnest(CASE WHEN t.has_r THEN c.responses_parents ELSE [NULL] END) AS r(r)
  CROSS JOIN unnest(CASE WHEN t.has_s THEN c.situations_parents ELSE [NULL] END) AS s(s)
  WHERE s.s IS NULL OR len(string_split(s.s, ':')) >= 3
), q AS (
  SELECT replace(replace(replace(replace(template,
           '{response}', coalesce(resp, 'None')),
           '{situation}', coalesce(sit, 'None')),
           '{org_name}', coalesce(org, 'None')),
           '{city_name}', coalesce(city, 'None')) AS query,
         importance, resp, sit, org, city,
         ((resp IS NOT NULL AND NOT list_contains(direct_responses, resp))
          OR (sit IS NOT NULL AND NOT list_contains(direct_situations, sit))
          OR (org IS NOT NULL AND organization_branch_count < 5)) AS low
  FROM ex
), grouped AS (
  SELECT query,
         count(*) OVER (PARTITION BY query) AS n,
         bool_and(low) OVER (PARTITION BY query) AS low_all,
         importance, resp AS response, sit AS situation,
         org AS org_name, city AS city_name,
         row_number() OVER (PARTITION BY query ORDER BY importance ASC,
            resp ASC NULLS LAST, sit ASC NULLS LAST,
            org ASC NULLS LAST, city ASC NULLS LAST) AS rn
  FROM q
  WHERE query NOT LIKE '%None%'
  QUALIFY rn = 1
), bnds AS (
  SELECT CASE WHEN CAST(substr(location, 5) AS INT) % 3 = 0 THEN city || 'X' ELSE city END AS bkey,
         CAST(substr(location, 5) AS INT) AS bnk,
         printf('[%.5f,%.5f,%.5f,%.5f]', lon - 0.1, lat - 0.1, lon + 0.1, lat + 0.1) AS bounds
  FROM locs
), best AS (
  SELECT g.query, b.bounds
  FROM grouped g JOIN bnds b ON levenshtein(g.city_name, b.bkey) <= 2
  WHERE g.city_name IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY g.query
            ORDER BY levenshtein(g.city_name, b.bkey) ASC, b.bkey ASC, b.bnk ASC) = 1
)
SELECT g.query,
       trim(regexp_replace(g.query, '[^0-9a-zA-Zא-ת]+', '_', 'g'), '_') AS qid,
       CAST(g.n AS BIGINT) AS n,
       round(CASE WHEN g.low_all THEN 0.5 ELSE pow(ln(CAST(g.n AS DOUBLE)) + 1, 2) END, 6) AS score,
       g.importance, g.response, g.situation, g.org_name, g.city_name,
       g.low_all AS low,
       b.bounds
FROM grouped g LEFT JOIN best b USING (query)
WHERE g.city_name IS NULL OR b.bounds IS NOT NULL
"""


# --------------------------------------------------------------------------
# q76 — sequence packing for training batches (operators/packing.py)
# --------------------------------------------------------------------------

_Q76_BUDGET = 2048
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def q76_sequence_packing(spark, sf_dir):
    """Concat-then-chunk packing of the documents corpus into 2048-token
    training sequences, stratified by language (one prefix-sum window per
    lang — no stratum holds the corpus). Emits per-sequence stats: how many
    documents land in each sequence and how many tokens they carry (head
    sequences hold exactly ~budget; each stratum's tail is partial)."""
    from ..operators.packing import pack_sequences  # noqa: PLC0415

    d = _t(spark, sf_dir, "documents")
    toks = F.coalesce(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), F.lit(0))),
        F.lit(0),
    ).cast("long")
    per_doc = d.select("doc_id", "lang", toks.alias("n_tokens"))
    packed = pack_sequences(
        per_doc, "n_tokens", [F.asc("doc_id")], _Q76_BUDGET, strata=["lang"]
    )
    return packed.groupBy("lang", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


Q76_SQL = rf"""
WITH per_doc AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start_offset
  FROM per_doc
)
SELECT lang, CAST(floor(start_offset / {_Q76_BUDGET}) AS BIGINT) AS seq_id,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       min(doc_id) AS first_doc
FROM packed GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q77 — BM25 keyword retrieval over the documents corpus
# --------------------------------------------------------------------------

_Q77_TERMS = ("hash", "join", "vector")
_Q77_K1, _Q77_B, _Q77_TOPK = 1.2, 0.75, 20


def q77_bm25_search(spark, sf_dir):
    """Okapi BM25 scoring for a 3-term keyword query with top-k retrieval —
    the search primitive a corpus-curation pipeline uses for targeted
    sampling. Everything is relational: per-(doc, term) term frequencies from
    one explode (filtered to the query terms before the shuffle), document
    frequencies and corpus stats as broadcast singletons, the score a pure
    expression, top-k a bounded sort."""
    d = _t(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
    per_doc = d.select("doc_id", words.alias("w")).select(
        "doc_id", F.size("w").cast("double").alias("dl"), "w"
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    # term frequencies as per-document array scans — for a fixed small query
    # the token array is counted in place (3 filtered sizes per doc) instead
    # of exploding the whole corpus' tokens into ~dl× more rows; the only
    # rows that leave the map are (doc, matched term).
    def _eq(term):
        return lambda x: x == F.lit(term)

    tf_arr = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.size(F.filter("w", _eq(t))).cast("double").alias("tf"),
            )
            for t in _Q77_TERMS
        ]
    )
    tf = (
        per_doc.select("doc_id", "dl", F.explode(tf_arr).alias("t"))
        .select("doc_id", "dl", "t.term", "t.tf")
        .filter(F.col("tf") > 0)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "w_tf",
            (F.col("tf") * (_Q77_K1 + 1))
            / (F.col("tf") + _Q77_K1 * (1 - _Q77_B + _Q77_B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("idf") * F.col("w_tf")), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_Q77_TOPK)


Q77_SQL = f"""
WITH per_doc AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
), lens AS (
  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, w FROM per_doc
), corpus AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens
), tf AS (
  SELECT doc_id, t.term, CAST(count(*) AS DOUBLE) AS tf, any_value(dl) AS dl
  FROM lens, unnest(w) AS t(term)
  WHERE t.term IN ('hash', 'join', 'vector')
  GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
)
SELECT doc_id,
       round(sum(
         ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (t.tf * ({_Q77_K1} + 1)) / (t.tf + {_Q77_K1} * (1 - {_Q77_B} + {_Q77_B} * t.dl / c.avgdl))
       ), 6) AS bm25
FROM tf t JOIN dfreq d USING (term) CROSS JOIN corpus c
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT {_Q77_TOPK}
"""


# --------------------------------------------------------------------------
# q78 — composed corpus-curation funnel (pipelines/curation.py)
# --------------------------------------------------------------------------


def q78_curation_funnel(spark, sf_dir):
    """The composed training-data pipeline — exact dedup → C4/Gopher quality
    gate → per-language sequence packing — with the per-stage
    (rows, tokens) audit funnel the reference's filter-with-stat discipline
    demands. Each stage is the already-verified standalone operator; this
    gate checks their composition end-to-end."""
    from ..pipelines.curation import curation_funnel  # noqa: PLC0415

    return curation_funnel(_t(spark, sf_dir, "documents"))


_BPE_SQL = r"CAST(len(regexp_extract_all({c}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)"

Q78_SQL = f"""
WITH normed AS (
  SELECT doc_id, lang, text, {_NORM.format(c='text')} AS norm FROM documents
), deduped AS (
  SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, arg_min(text, doc_id) AS text
  FROM normed GROUP BY norm
), qbase AS (
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks,
         length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s]', '', 'g')) AS n_punct
  FROM deduped
), counted AS (
  SELECT doc_id, lang, text, nonspace, n_punct,
         CAST(len(toks) AS INT) AS n_tokens,
         CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS INT) AS total_word_chars,
         CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                              t -> list_contains({_STOP_SQL}, t))) AS INT) AS n_stopwords
  FROM qbase
), quality AS (
  SELECT doc_id, lang, text FROM counted
  WHERE n_tokens >= 50
    AND 3 * n_tokens <= total_word_chars AND total_word_chars <= 10 * n_tokens
    AND n_punct * 10 <= nonspace
    AND n_stopwords >= 2
), sized AS (
  SELECT doc_id, lang, {_BPE_SQL.format(c='text')} AS n_tokens FROM quality
), packed AS (
  SELECT lang, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                    / 2048) AS BIGINT) AS seq_id
  FROM sized
)
SELECT '00_raw' AS stage, count(*) AS n_rows,
       CAST(coalesce(sum({_BPE_SQL.format(c='text')}), 0) AS BIGINT) AS n_tokens FROM documents
UNION ALL
SELECT '10_deduped', count(*), CAST(coalesce(sum({_BPE_SQL.format(c='text')}), 0) AS BIGINT) FROM deduped
UNION ALL
SELECT '20_quality', count(*), CAST(coalesce(sum({_BPE_SQL.format(c='text')}), 0) AS BIGINT) FROM quality
UNION ALL
SELECT '30_packed_sequences', count(DISTINCT (lang, seq_id)),
       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM packed
"""


# --------------------------------------------------------------------------
# q79 — incremental dedup against a historical corpus (operators/dedup.py)
# --------------------------------------------------------------------------


def q79_incremental_dedup(spark, sf_dir):
    """Incremental-ingestion dedup: the batch (doc_id % 3 != 0) collapses its
    own exact duplicates (min-id keeper + dup_count) and drops documents
    whose order-insensitive content fingerprint already exists in the history
    (doc_id % 3 == 0), probed through a bloom runtime filter so only
    maybe-seen candidates reach the exact anti-join. The oracle compares on
    the fingerprint's preimage string (hash equality == string equality)."""
    from ..operators.dedup import incremental_dedup  # noqa: PLC0415
    from ..functions.text import fingerprint  # noqa: PLC0415

    d = _t(spark, sf_dir, "documents")
    history = d.filter(F.col("doc_id") % 3 == 0).select(
        fingerprint(F.col("text")).alias("fp")
    )
    batch = d.filter(F.col("doc_id") % 3 != 0)
    out = incremental_dedup(batch, history)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dup_count").cast("long").alias("dup_count"),
    )


_FPS_SQL = (
    "array_to_string(list_sort(list_distinct(list_filter("
    "string_split_regex(trim(" + _NORM.format(c="text") + "), '\\s+'),"
    " t -> t != ''))), ' ')"
)

Q79_SQL = f"""
WITH f AS (
  SELECT doc_id, {_FPS_SQL} AS fps FROM documents
), hist AS (
  SELECT DISTINCT fps FROM f WHERE doc_id % 3 = 0
), batch AS (
  SELECT doc_id, fps FROM f WHERE doc_id % 3 != 0
), keeper AS (
  SELECT min(doc_id) AS doc_id, count(*) AS dup_count, fps FROM batch GROUP BY fps
)
SELECT CAST(k.doc_id AS BIGINT) AS doc_id, CAST(k.dup_count AS BIGINT) AS dup_count
FROM keeper k ANTI JOIN hist h USING (fps)
"""


EXT6_REGISTRY = {
    "q74_autocomplete_flow": QueryDef(
        q74_autocomplete_flow, Q74_SQL, "U5 W2 J7 F12 autocomplete:165-207 §3.1"
    ),
    "q75_card_surface": QueryDef(
        q75_card_surface, Q75_SQL, "A10-apply A5 F5 F6 F12 F19 F20 to_dp:835-915"
    ),
    "q76_sequence_packing": QueryDef(
        q76_sequence_packing, Q76_SQL, "LLM-pipeline: training-sequence packing"
    ),
    "q77_bm25_search": QueryDef(
        q77_bm25_search, Q77_SQL, "LLM-pipeline: BM25 corpus retrieval"
    ),
    "q78_curation_funnel": QueryDef(
        q78_curation_funnel, Q78_SQL, "LLM-pipeline: composed curation funnel P7-style"
    ),
    "q79_incremental_dedup": QueryDef(
        q79_incremental_dedup, Q79_SQL, "LLM-pipeline: bloom-pruned incremental dedup"
    ),
}
