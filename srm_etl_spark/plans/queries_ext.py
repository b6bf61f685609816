"""Operator-inventory queries, round-2 extension set (q37-q46).

Covers the SURVEY.md §2 items the first 36 queries left out: the string
cleaners (F1/F4/F9/F10), fuzzy matching joins (J7/J9), the TF-IDF score table
(A10), template cross-product explode (U5), sentinel/JSON value policies
(P10/S10), the geo kernels including native plus-codes (F18-F21), age-range
tagging (F26), global enumerate + limit (W1/O1/O4), embedding-cosine near-dup
pairs, and the taxonomy rewrite rules (F15/F16).

Same conventions as ``queries.py``: identical column aliases on both engines,
integer outputs pinned to BIGINT in DuckDB, doubles rounded well clear of
representation noise, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.cleaning import (
    fix_url,
    remove_whitespaces,
    slugify,
    transform_phone_numbers,
)
from ..functions.geo import calc_point_id, olc_encode, point_offset, validate_geometry
from ..functions.scoring import idf_score_table
from ..functions.taxonomy import (
    fix_situations,
    normalize_taxonomy_ids,
    situations_for_age_range,
)
from ..operators.dedup import embedding_near_dup_pairs_arrow
from .queries import QueryDef, _t


# --------------------------------------------------------------------------
# q37 — string cleaners (F1 phone format, F4 whitespace, F9 slug, F10 url)
# --------------------------------------------------------------------------

def q37_clean_contacts(spark, sf_dir):
    """F1/F4/F9/F10 cleaners over synthesized contact text (all four shapes
    the reference handles: local 9/10-digit, +972 international, free text).
    Pure projection — no shuffle, fully codegen'd, scales as a map-only pass."""
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    phone_raw = (
        F.when(k % 4 == 0, F.concat(F.lit("03"), F.lpad(((k * 7) % 10000000).cast("string"), 7, "0")))
        .when(k % 4 == 1, F.concat(F.lit("054"), F.lpad(((k * 3) % 10000000).cast("string"), 7, "0")))
        .when(k % 4 == 2, F.concat(F.lit("+972-54-"), F.lpad(((k * 9) % 10000000).cast("string"), 7, "0")))
        .otherwise(F.lit("  contact us  "))
    )
    url_raw = (
        F.when(k % 3 == 0, F.lit("https://example.org/x"))
        .when(k % 3 == 1, F.lit("www.kolsherut.org.il"))
        .otherwise(F.lit("not a url!!"))
    )
    messy = F.concat(
        F.lit("  ("), F.col("c_mktsegment"), F.lit("   "), F.col("c_name"), F.lit(" - ")
    )
    return c.select(
        "c_custkey",
        F.element_at(transform_phone_numbers(phone_raw), 1).alias("phone_fmt"),
        fix_url(url_raw).alias("url_fixed"),
        slugify(F.col("c_name")).alias("name_slug"),
        remove_whitespaces(messy).alias("comment_clean"),
    )


Q37_SQL = r"""
WITH base AS (
  SELECT c_custkey, c_name,
    '  (' || c_mktsegment || '   ' || c_name || ' - ' AS messy,
    CASE CAST(c_custkey % 4 AS INT)
      WHEN 0 THEN '03'  || lpad(CAST((c_custkey*7) % 10000000 AS VARCHAR), 7, '0')
      WHEN 1 THEN '054' || lpad(CAST((c_custkey*3) % 10000000 AS VARCHAR), 7, '0')
      WHEN 2 THEN '+972-54-' || lpad(CAST((c_custkey*9) % 10000000 AS VARCHAR), 7, '0')
      ELSE '  contact us  ' END AS phone_raw,
    CASE CAST(c_custkey % 3 AS INT)
      WHEN 0 THEN 'https://example.org/x'
      WHEN 1 THEN 'www.kolsherut.org.il'
      ELSE 'not a url!!' END AS url_raw
  FROM customer
), fmt AS (
  SELECT *, trim(phone_raw) AS trimmed,
         regexp_replace(trim(phone_raw), '\D', '', 'g') AS digits0
  FROM base
), fmt2 AS (
  SELECT *,
    CASE WHEN length(digits0) > 10 AND digits0 LIKE '972%' THEN
      CASE WHEN length(substr(digits0, 4)) < 10 AND substr(digits0, 4, 1) != '0'
           THEN '0' || substr(digits0, 4) ELSE substr(digits0, 4) END
    ELSE digits0 END AS d
  FROM fmt
)
SELECT c_custkey,
  CASE
    WHEN length(d) = 9  AND d LIKE '0%' THEN substr(d,1,2) || '-' || substr(d,3,3) || '-' || substr(d,6,4)
    WHEN length(d) = 10 AND d LIKE '0%' THEN substr(d,1,3) || '-' || substr(d,4,3) || '-' || substr(d,7,4)
    WHEN length(d) = 10 AND d LIKE '1%' THEN substr(d,1,1) || '-' || substr(d,2,3) || '-' || substr(d,5,6)
    ELSE trimmed END AS phone_fmt,
  CASE
    WHEN url_raw LIKE 'http%' THEN url_raw
    WHEN regexp_matches(url_raw, '^[a-zA-Z0-9][a-zA-Z0-9\-\.]{0,61}[a-zA-Z0-9]\.[a-zA-Z]{2,}$')
      THEN 'http://' || url_raw
    ELSE NULL END AS url_fixed,
  regexp_replace(regexp_replace(lower(trim(c_name)), '[^a-z0-9֐-׿]+', '-', 'g'), '^-+|-+$', '', 'g') AS name_slug,
  regexp_replace(regexp_replace(messy, '\s+', ' ', 'g'), '^[ \t(\n\-]+|[ \t(\n\-]+$', '', 'g') AS comment_clean
FROM fmt2
"""


# --------------------------------------------------------------------------
# q38 — fuzzy match join (J7/J9): levenshtein + blocking + best-match window
# --------------------------------------------------------------------------

def q38_fuzzy_nation_match(spark, sf_dir):
    """J7/J9 fuzzy join: corrupted city strings (last char dropped, lowered)
    matched back to the nation list by levenshtein distance.

    Scale shape: candidate generation is an equi-join on a blocking key
    (first letter) — never a raw cross join; the dimension side is broadcast;
    best-match is a per-key window with deterministic tie-break. At 100 TB
    the messy side streams through the broadcast block map unchanged."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    messy = n.select(
        F.col("n_nationkey").alias("m_key"),
        F.lower(F.expr("substring(n_name, 1, length(n_name)-1)")).alias("city"),
    )
    cand = (
        messy.join(
            F.broadcast(n),
            F.substring(F.col("city"), 1, 1) == F.lower(F.substring(F.col("n_name"), 1, 1)),
        )
        .withColumn("dist", F.levenshtein(F.col("city"), F.lower(F.col("n_name"))))
        .filter(F.col("dist") <= 3)
    )
    w = Window.partitionBy("m_key").orderBy("dist", "n_name")
    best = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    cust = _t(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return best.join(cust, best.m_key == cust.c_nationkey).select(
        "city",
        F.col("n_name").alias("matched_nation"),
        F.col("dist").cast("long").alias("dist"),
        "n_customers",
    )


Q38_SQL = """
WITH n AS (SELECT n_nationkey, n_name FROM nation),
messy AS (
  SELECT n_nationkey AS m_key, lower(substr(n_name, 1, length(n_name)-1)) AS city FROM n
),
cand AS (
  SELECT m.m_key, m.city, n.n_name, levenshtein(m.city, lower(n.n_name)) AS dist
  FROM messy m JOIN n ON substr(m.city, 1, 1) = lower(substr(n.n_name, 1, 1))
  WHERE levenshtein(m.city, lower(n.n_name)) <= 3
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY m_key ORDER BY dist, n_name) AS rn FROM cand
)
SELECT b.city, b.n_name AS matched_nation, CAST(b.dist AS BIGINT) AS dist, c.n_customers
FROM best b
JOIN (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey) c
  ON b.m_key = c.c_nationkey
WHERE b.rn = 1
"""


# --------------------------------------------------------------------------
# q39 — A10 RSScoreCalc: log(total/freq) score table
# --------------------------------------------------------------------------

def q39_idf_scores(spark, sf_dir):
    """A10 (reference to_dp.py:700-753): per-(group,item) IDF-style score
    log(group_total / freq). The score table's cardinality is |groups|x|items|
    — independent of fact size, broadcastable into any downstream scoring
    join. Aggregation collapses map-side before the tiny window."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pairs = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderpriority", "c_mktsegment"
    )
    tbl = idf_score_table(pairs, "o_orderpriority", "c_mktsegment", "idf")
    return tbl.select(
        "o_orderpriority", "c_mktsegment", F.round(F.col("idf"), 6).alias("idf")
    )


Q39_SQL = """
WITH freq AS (
  SELECT o_orderpriority, c_mktsegment, count(*) AS f
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT o_orderpriority, c_mktsegment,
       round(ln(CAST(sum(f) OVER (PARTITION BY o_orderpriority) AS DOUBLE) / f), 6) AS idf
FROM freq
"""


# --------------------------------------------------------------------------
# q40 — U5 template cross-product explode (autocomplete corpus)
# --------------------------------------------------------------------------

_TEMPLATES = ["services for {n} in {r}", "help with {n}", "{r} services"]


def q40_autocomplete_templates(spark, sf_dir):
    """U5 (reference autocomplete.py:61-138): query templates exploded against
    entity names. explode of a literal array — a lateral fan-out, no shuffle
    until the final small groupBy; region-level templates collapse 5:1."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", F.lower("n_name").alias("nn"), F.lower("r_name").alias("rn")
    )
    tpl = F.array(*[F.lit(t) for t in _TEMPLATES])
    ex = nr.select("n_nationkey", "nn", "rn", F.explode(tpl).alias("t"))
    q = F.replace(
        F.replace(F.col("t"), F.lit("{n}"), F.col("nn")), F.lit("{r}"), F.col("rn")
    )
    return ex.select(q.alias("query"), "n_nationkey").groupBy("query").agg(
        F.count(F.lit(1)).alias("n"), F.min("n_nationkey").alias("first_key")
    )


Q40_SQL = """
WITH nr AS (
  SELECT n_nationkey, lower(n_name) AS nn, lower(r_name) AS rn
  FROM nation JOIN region ON n_regionkey = r_regionkey
),
ex AS (
  SELECT n_nationkey, replace(replace(t, '{n}', nn), '{r}', rn) AS query
  FROM nr CROSS JOIN unnest(['services for {n} in {r}', 'help with {n}', '{r} services']) AS u(t)
)
SELECT query, count(*) AS n, min(n_nationkey) AS first_key FROM ex GROUP BY query
"""


# --------------------------------------------------------------------------
# q41 — P10/S10: JSON payload extraction with sentinel/null policy
# --------------------------------------------------------------------------

def q41_json_props(spark, sf_dir):
    """P10 + S10: extract a numeric field from the JSON props payload; rows
    where extraction fails are dropped (the reference's validate-with-drop
    policy). regexp extraction stays JVM-side; filter pushes to the scan."""
    ev = _t(spark, sf_dir, "events")
    k_str = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
    k = F.when(k_str != "", k_str.cast("long"))
    valid = ev.select("event_type", k.alias("k")).filter(F.col("k").isNotNull())
    return valid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


Q41_SQL = r"""
WITH parsed AS (
  SELECT event_type, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
  FROM events
  WHERE regexp_extract(props, '"k": (\d+)', 1) != ''
)
SELECT event_type, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
       round(avg(k), 4) AS avg_k
FROM parsed GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q42 — geo kernels: point ids, bbox validation, plus codes, co-located offsets
# --------------------------------------------------------------------------

def q42_geo_points(spark, sf_dir):
    """F18-F21: point_id formatting, Israel-bbox validation, native OLC plus
    codes, and ring offsets for co-located points (per-region index). All
    column math — one window pair per region for the offsets, no UDF."""
    n = _t(spark, sf_dir, "nation")
    lat = F.lit(29.5) + (F.col("n_nationkey") % 10) * F.lit(0.35)
    lon = F.lit(33.2) + (F.col("n_nationkey") % 12) * F.lit(0.3)
    pts = n.select(
        "n_nationkey",
        "n_regionkey",
        F.array(lon, lat).alias("geometry"),
        lat.alias("lat"),
        lon.alias("lon"),
    )
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    cnt = Window.partitionBy("n_regionkey")
    off = point_offset(F.row_number().over(w) - 1, F.count(F.lit(1)).over(cnt))
    return pts.select(
        "n_nationkey",
        calc_point_id(F.col("geometry")).alias("point_id"),
        validate_geometry(F.col("geometry")).alias("in_israel"),
        olc_encode(F.col("lat"), F.col("lon"), 11).alias("pluscode"),
        F.round(F.element_at(off, 1), 8).alias("dlon"),
        F.round(F.element_at(off, 2), 8).alias("dlat"),
    )


# The OLC oracle replicates the public spec digit-by-digit: base-20 pairs over
# the shifted (lat+90, lon+180) grid at 1/8000 deg, '+' after digit 8, 5x4
# refinement for digit 11 — identical IEEE double math on both engines.
_OLC_D = (
    "substr('23456789CFGHJMPQRVWX', "
    "CAST(floor({v} / {div}) % 20 AS INT) + 1, 1)"
)


def _olc_sql(lat_expr: str, lon_expr: str, code_length: int = 11) -> str:
    latc = f"(least(greatest({lat_expr}, -90.0), 90.0) + 90.0)"
    lonc = f"(((({lon_expr}) + 180.0) % 360.0 + 360.0) % 360.0)"
    lat_i = f"least(floor({latc} * 8000), 1439999)"
    lon_i = f"floor({lonc} * 8000)"
    digs = []
    for i in range(5):
        div = 20 ** (4 - i)
        digs.append((_OLC_D.format(v=lat_i, div=div), _OLC_D.format(v=lon_i, div=div)))
    code10 = " || ".join(
        [d for pair in digs[:4] for d in pair] + ["'+'"] + list(digs[4])
    )
    lat_frac = f"({latc} * 8000 - floor({latc} * 8000))"
    lon_frac = f"({lonc} * 8000 - floor({lonc} * 8000))"
    if code_length <= 10:
        return code10
    idx = (
        f"(CAST(least(floor({lat_frac} * 5), 4) AS INT) * 4"
        f" + CAST(least(floor({lon_frac} * 4), 3) AS INT))"
    )
    d11 = f"substr('23456789CFGHJMPQRVWX', {idx} + 1, 1)"
    return f"{code10} || {d11}"


Q42_SQL = f"""
WITH pts AS (
  -- CAST the literals to DOUBLE: DuckDB otherwise parses them as exact
  -- DECIMALs and lands on the other side of OLC grid-cell boundaries than
  -- Spark's IEEE double math (33.2+0.6 -> 33.800000000000004 -> cell-1).
  SELECT n_nationkey, n_regionkey,
         CAST(29.5 AS DOUBLE) + (n_nationkey % 10) * CAST(0.35 AS DOUBLE) AS lat,
         CAST(33.2 AS DOUBLE) + (n_nationkey % 12) * CAST(0.3  AS DOUBLE) AS lon
  FROM nation
), wins AS (
  SELECT *,
         row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) - 1 AS idx,
         count(*) OVER (PARTITION BY n_regionkey) AS total
  FROM pts
)
SELECT n_nationkey,
  replace(printf('%08.5f%08.5f', lon, lat), '.', '') AS point_id,
  (lon > 33.0 AND lon < 37.0 AND lat > 29.3 AND lat < 33.3) AS in_israel,
  {_olc_sql('lat', 'lon')} AS pluscode,
  CASE WHEN total <= 1 THEN 0.0
       ELSE round(cos(2 * pi() * idx / total) * 0.00004, 8) END AS dlon,
  CASE WHEN total <= 1 THEN 0.0
       ELSE round(sin(2 * pi() * idx / total) * 0.00004, 8) END AS dlat
FROM wins
"""


# --------------------------------------------------------------------------
# q43 — F26 age-range -> age-group tags
# --------------------------------------------------------------------------

def q43_age_groups(spark, sf_dir):
    """F26 (reference situations.py:42-62): interval-overlap tagging, exploded
    to a per-tag frequency. The tag array is a pure projection; the explode
    fans out <= 6 rows per input; counts collapse map-side."""
    c = _t(spark, sf_dir, "customer")
    mn = F.col("c_custkey") % 77
    mx = mn + F.col("c_custkey") % 41
    tags = situations_for_age_range(mn, mx)
    return (
        c.select(F.explode(tags).alias("tag"))
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q43_SQL = """
WITH ages AS (
  SELECT c_custkey % 77 AS mn, c_custkey % 77 + c_custkey % 41 AS mx FROM customer
), flags AS (
  SELECT (mn <= 54 AND mx >= 31) AS adults,
         (mn <= 30 AND mx >= 20) AS young_adults,
         (mn <= 19 AND mx >= 13) AS teens,
         (mn <= 1  AND mx >= 0)  AS infants,
         (mn <= 12 AND mx >= 2)  AS children,
         (mx >= 55)              AS seniors
  FROM ages
), kept AS (
  SELECT * FROM flags
  WHERE NOT (adults AND young_adults AND teens AND infants AND children AND seniors)
), tags AS (
  SELECT 'human_situations:age_group:adults' AS tag FROM kept WHERE adults
  UNION ALL SELECT 'human_situations:age_group:young_adults' FROM kept WHERE young_adults
  UNION ALL SELECT 'human_situations:age_group:teens' FROM kept WHERE teens
  UNION ALL SELECT 'human_situations:age_group:infants' FROM kept WHERE infants
  UNION ALL SELECT 'human_situations:age_group:children' FROM kept WHERE children
  UNION ALL SELECT 'human_situations:age_group:seniors' FROM kept WHERE seniors
)
SELECT tag, count(*) AS n FROM tags GROUP BY tag
"""


# --------------------------------------------------------------------------
# q44 — W1 global enumerate + O4 limit (top-N take-ordered)
# --------------------------------------------------------------------------

def q44_enumerate_topn(spark, sf_dir):
    """W1 enumerate_rows + O1/O4: global rank over a sort, limited to 100.
    Shape matters at scale: orderBy().limit(k) compiles to TakeOrderedAndProject
    (per-partition top-k then a k-row merge) — the global row_number window
    only ever runs over the already-limited 100 rows."""
    p = (
        _t(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(100)
    )
    w = Window.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.withColumn("score", F.row_number().over(w).cast("long"))


Q44_SQL = """
WITH ranked AS (
  SELECT p_partkey, p_retailprice,
         CAST(row_number() OVER (ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS score
  FROM part
)
SELECT * FROM ranked WHERE score <= 100
"""


# --------------------------------------------------------------------------
# q45 — embedding-cosine near-duplicate pairs (blocked exact)
# --------------------------------------------------------------------------

def q45_embedding_near_dup(spark, sf_dir):
    """Embedding near-dup pairs: cosine >= threshold within label blocks,
    scored by the per-block BLAS kernel (operators/dedup.py:
    embedding_near_dup_pairs_arrow). Blocking keeps the comparison linear in
    block count — the 100 TB shape swaps the label for an LSH bucket (q30
    exercises that path); the pair semantics and verification stay
    identical. The expression-only twin (embedding_near_dup_pairs) is
    parity-tested in tests/test_dedup.py."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs_arrow(
        emb, "embedding", "vec_id", threshold=0.3, block_col="label"
    )
    return pairs.select(
        "left_id", "right_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


Q45_SQL = """
SELECT l.vec_id AS left_id, r.vec_id AS right_id,
       round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
                                    CAST(r.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings l JOIN embeddings r
  ON l.label = r.label AND l.vec_id < r.vec_id
WHERE list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
                             CAST(r.embedding AS DOUBLE[])) >= 0.3
"""


# --------------------------------------------------------------------------
# q46 — F15/F16 taxonomy-id normalization + situation rules (golden oracle)
# --------------------------------------------------------------------------

def q46_taxonomy_fix(spark, sf_dir):
    """F15/F16: normalize malformed taxonomy-id lists (comma-joined, smashed,
    singular-root typo, bare roots, stray punctuation) then apply the
    situation business rules (drop men+women pair, drop hebrew_speaking,
    sectors:arabs/bedouin => +arabic_speaking). Six hand-verified input
    shapes cycle over part; the oracle pins the exact expected expansion."""
    p = _t(spark, sf_dir, "part")
    m = (F.col("p_partkey") % 6).cast("int")
    raw = (
        F.when(m == 0, F.array(F.lit("human_situations:age_group:adults")))
        .when(m == 1, F.array(F.lit("human_situations:age_group:adults,human_situations:age_group:seniors")))
        .when(m == 2, F.array(F.lit("human_situation:sectors:arabs")))
        .when(m == 3, F.array(F.lit("human_situations:gender:men human_situations:gender:women")))
        .when(m == 4, F.array(F.lit("human_situations:language:hebrew_speaking"), F.lit("human_situations:disability:deafness")))
        .otherwise(F.array(F.lit("human_situations"), F.lit(" human_situations:sectors:bedouin; ")))
    )
    ids = fix_situations(normalize_taxonomy_ids(raw))
    return (
        p.select(F.explode(ids).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q46_SQL = """
WITH pat AS (SELECT CAST(p_partkey % 6 AS INT) AS m FROM part),
tags AS (
  SELECT unnest(CASE m
    WHEN 0 THEN ['human_situations:age_group:adults']
    WHEN 1 THEN ['human_situations:age_group:adults', 'human_situations:age_group:seniors']
    WHEN 2 THEN ['human_situations:sectors:arabs', 'human_situations:language:arabic_speaking']
    WHEN 3 THEN CAST([] AS VARCHAR[])
    WHEN 4 THEN ['human_situations:disability:deafness']
    ELSE ['human_situations:sectors:bedouin', 'human_situations:language:arabic_speaking']
  END) AS id
  FROM pat
)
SELECT id, count(*) AS n FROM tags GROUP BY id
"""


EXT_REGISTRY: dict[str, QueryDef] = {
    "q37_clean_contacts": QueryDef(q37_clean_contacts, Q37_SQL, "F1 F4 F9 F10"),
    "q38_fuzzy_nation_match": QueryDef(q38_fuzzy_nation_match, Q38_SQL, "J7 J9 O5"),
    "q39_idf_scores": QueryDef(q39_idf_scores, Q39_SQL, "A10 F12"),
    "q40_autocomplete_templates": QueryDef(q40_autocomplete_templates, Q40_SQL, "U5 J6"),
    "q41_json_props": QueryDef(q41_json_props, Q41_SQL, "P10 S10"),
    "q42_geo_points": QueryDef(q42_geo_points, Q42_SQL, "F18 F19 F20 F21"),
    "q43_age_groups": QueryDef(q43_age_groups, Q43_SQL, "F26"),
    "q44_enumerate_topn": QueryDef(q44_enumerate_topn, Q44_SQL, "W1 O1 O4"),
    "q45_embedding_near_dup": QueryDef(q45_embedding_near_dup, Q45_SQL, "dedup-embedding"),
    "q46_taxonomy_fix": QueryDef(q46_taxonomy_fix, Q46_SQL, "F15 F16"),
}
