"""Round-5 extension queries, part 1: the `entities` ingestion vertical
(SURVEY §3.2) composed end-to-end — the round-4 verdict's top ask.

q126 — org enrichment: Guidestar-hit / BudgetKey-fallback / srm-passthrough /
       unknown-report paths (reference operators/entities/__init__.py:28-104).
q127 — unwind_branches: branch synthesis + the two no-branch fallbacks +
       synthesized national rows (:162-250).
q128 — unwind_services/process_service: the payment/area/when/remote enum
       cascades, taxonomy tag union, branch-list repair (:325-587).
q129 — the staged composition: the vertical's merges chained through
       staging_upsert (§2.10), summarized per table.
q130 — the unknown-tag curator write-back (:336-346) as data.

Every oracle mirrors the deterministic scrape fixtures of
pipelines/entities.py 1:1 in SQL, so the whole vertical is hash-gated
against DuckDB. SQL fragments are GENERATED from the same literal tables
where drift is possible (the q108 discipline): the taxonomy mapping VALUES
clause comes from pipelines.entities.TAG_ROWS.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..pipelines import entities as ENT
from ._scalar import scalarized_sql, stringify_arrays
from .queries import QueryDef
from .queries_ext import _olc_sql

# ---------------------------------------------------------------------------
# shared oracle CTEs mirroring the scrape fixtures
# ---------------------------------------------------------------------------

_ORG_ID_SQL = (
    "CASE WHEN {k} % 11 = 0 THEN 'srm' || CAST({k} AS VARCHAR) "
    "WHEN {k} % 2 = 0 THEN CAST({k} + 500000000 AS VARCHAR) "
    "ELSE CAST({k} + 510000000 AS VARCHAR) END"
)

_KINDS_SQL = "['עמותה', 'חל\"צ', 'חברה פרטית', 'הקדש', 'רשות מקומית']"
_MALKAR_SQL = "['עמותה', 'חברה', 'חל\"צ', 'הקדש', 'רשות מקומית']"

ORG_REGISTRY_CTE = f"""
org_registry AS (
  SELECT {_ORG_ID_SQL.format(k="s_suppkey")} AS id,
         CASE WHEN s_suppkey % 17 = 0 THEN 'manual' ELSE 'entities' END AS source,
         CASE WHEN s_suppkey % 10 = 9 THEN 'INACTIVE' ELSE 'ACTIVE' END AS status,
         ({_KINDS_SQL})[(s_suppkey % 5) + 1] AS kind,
         'ארגון ' || s_name AS name,
         CAST(NULL AS VARCHAR) AS short_name,
         CASE WHEN s_suppkey % 6 = 0 THEN 'תיאור ' || CAST(s_suppkey AS VARCHAR) END AS description,
         CAST(NULL AS VARCHAR) AS purpose,
         CAST(NULL AS VARCHAR) AS urls,
         CAST(NULL AS VARCHAR) AS phone_numbers,
         CAST(NULL AS VARCHAR) AS email_address
  FROM supplier
)"""

GS_DETAILS_CTE = f"""
gs_details AS (
  SELECT {_ORG_ID_SQL.format(k="s_suppkey")} AS id,
         CASE WHEN s_suppkey % 4 = 0 THEN s_name || ' (ע"ר)'
              WHEN s_suppkey % 8 = 1 THEN s_name || ' (חל"צ)'
              ELSE s_name END AS gs_name,
         CASE WHEN s_suppkey % 3 = 0 THEN 'קיצור' || CAST(s_suppkey AS VARCHAR) END AS abbreviated,
         ({_MALKAR_SQL})[(s_suppkey % 5) + 1] AS malkar_type,
         CASE WHEN s_suppkey % 2 = 0 THEN 'מטרה ' || CAST(s_suppkey AS VARCHAR) END AS org_goal,
         CASE WHEN s_suppkey % 3 = 0 THEN 'example' || CAST(s_suppkey AS VARCHAR) || '.org'
              WHEN s_suppkey % 3 = 1 THEN 'https://site' || CAST(s_suppkey AS VARCHAR) || '.org/x'
              ELSE 'not a url!' END AS website,
         CASE WHEN s_suppkey % 2 = 0
              THEN '02-' || lpad(CAST(s_suppkey % 10000000 AS VARCHAR), 7, '0') END AS tel1,
         CASE WHEN s_suppkey % 4 = 0 THEN '05' || CAST(s_suppkey % 10 AS VARCHAR) END AS tel2,
         CASE WHEN s_suppkey % 3 = 0
              THEN 'org' || CAST(s_suppkey AS VARCHAR) || '@example.org' END AS email,
         CASE WHEN s_suppkey % 5 != 1
              THEN 'רחוב הרצל ' || CAST(s_suppkey % 100 AS VARCHAR)
                   || ', עיר ' || CAST(s_suppkey % 7 AS VARCHAR) END AS full_address
  FROM supplier
  WHERE s_suppkey % 13 != 0 AND s_suppkey % 11 != 0
)"""

BK_CTE = f"""
bk AS (
  SELECT {_ORG_ID_SQL.format(k="s_suppkey")} AS id,
         'ארגון בק ' || s_name
           || CASE WHEN s_suppkey % 6 = 3 THEN ' (ע"ר)' ELSE '' END
           || '/סניף' AS bk_name,
         'עמותה' AS kind_he,
         CASE WHEN s_suppkey % 4 = 0 THEN 'מטרת בק ' || CAST(s_suppkey AS VARCHAR) END AS goal
  FROM supplier
  WHERE s_suppkey % 13 = 0 AND s_suppkey % 3 != 0 AND s_suppkey % 11 != 0
)"""


def _strip_legal_sql(expr: str) -> str:
    return f"replace(replace({expr}, ' (חל\"צ)', ''), ' (ע\"ר)', '')"


def _fix_url_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} LIKE 'http%' THEN {expr} "
        f"WHEN regexp_matches({expr}, "
        "'^[a-zA-Z0-9][a-zA-Z0-9\\-\\.]{0,61}[a-zA-Z0-9]\\.[a-zA-Z]{2,}$') "
        f"THEN 'http://' || {expr} ELSE NULL END"
    )


ENRICHED_CTE = f"""
enrich_base AS (
  SELECT o.*, g.id IS NOT NULL AS gs_hit, b.id IS NOT NULL AS bk_hit,
         g.gs_name, g.abbreviated, g.malkar_type, g.org_goal, g.website,
         g.tel1, g.tel2, g.email,
         b.bk_name, b.kind_he, b.goal,
         CASE WHEN o.id LIKE 'srm%' THEN 'srm'
              WHEN g.id IS NOT NULL THEN 'guidestar'
              WHEN b.id IS NOT NULL THEN 'budgetkey'
              ELSE 'unknown' END AS enrich_path,
         CASE WHEN b.id LIKE '50%' THEN coalesce(b.goal, b.bk_name) ELSE b.goal END AS bk_purpose,
         CASE WHEN b.id LIKE '50%' THEN trim(string_split(b.bk_name, '/')[1])
              ELSE b.bk_name END AS bk_name_fixed
  FROM (SELECT * FROM org_registry WHERE source = 'entities') o
  LEFT JOIN gs_details g ON o.id = g.id
  LEFT JOIN bk b ON o.id = b.id
),
enriched AS (
  SELECT id, source, status,
         CASE enrich_path
           WHEN 'guidestar' THEN CASE WHEN malkar_type = 'חברה' THEN 'חברה פרטית' ELSE malkar_type END
           WHEN 'budgetkey' THEN kind_he ELSE kind END AS kind,
         CASE enrich_path
           WHEN 'guidestar' THEN {_strip_legal_sql("gs_name")}
           WHEN 'budgetkey' THEN {_strip_legal_sql("bk_name_fixed")}
           ELSE name END AS name,
         CASE enrich_path WHEN 'guidestar' THEN abbreviated ELSE short_name END AS short_name,
         CASE enrich_path WHEN 'guidestar' THEN NULL ELSE description END AS description,
         CASE enrich_path
           WHEN 'guidestar' THEN org_goal
           WHEN 'budgetkey' THEN bk_purpose ELSE purpose END AS purpose,
         CASE enrich_path
           WHEN 'guidestar' THEN coalesce({_fix_url_sql("website")} || '#אתר הבית', '')
           ELSE urls END AS urls,
         CASE enrich_path
           WHEN 'guidestar' THEN concat_ws(chr(10), tel1, tel2)
           ELSE phone_numbers END AS phone_numbers,
         CASE enrich_path WHEN 'guidestar' THEN email ELSE email_address END AS email_address,
         enrich_path
  FROM enrich_base
)"""

# ---------------------------------------------------------------------------
# q126 — org enrichment parity
# ---------------------------------------------------------------------------


def q126_entities_org_enrich(spark, sf_dir):
    """SURVEY §3.2 stage 2 (reference entities/__init__.py:28-104): Guidestar
    cache hit / BudgetKey fallback (with the '50'-prefix name-split rule) /
    srm passthrough / unknown-ID report, as one broadcast-joined projection.
    The ``enrich_path`` column is the reference's Stats counter surfaced as
    data."""
    orgs = ENT.org_registry(spark, sf_dir)
    gs = ENT.guidestar_org_details(spark, sf_dir)
    bk = ENT.budgetkey_entities(spark, sf_dir)
    return ENT.enrich_orgs(orgs, gs, bk)


Q126_SQL = f"""
WITH {ORG_REGISTRY_CTE.strip()},
{GS_DETAILS_CTE.strip()},
{BK_CTE.strip()},
{ENRICHED_CTE.strip()}
SELECT * FROM enriched
"""

EXT13_REGISTRY = {
    "q126_entities_org_enrich": QueryDef(
        q126_entities_org_enrich,
        Q126_SQL,
        "entities vertical: org enrichment (gs/bk/srm/unknown paths)",
    ),
}


# ---------------------------------------------------------------------------
# q127 — unwind_branches parity
# ---------------------------------------------------------------------------

_NS_CTE = "ns AS (SELECT count(*) AS n FROM supplier)"

_ORG_K_SQL = "((c_custkey % greatest((ns.n * 4) // 5, 1)) + 1)"

GBRANCHES_CTE = f"""
gbranches AS (
  SELECT 'B' || CAST(c_custkey AS VARCHAR) AS branch_id,
         {_ORG_ID_SQL.format(k=_ORG_K_SQL)} AS org_id,
         CASE WHEN c_custkey % 3 = 0 THEN 'כינוי ' || CAST(c_custkey AS VARCHAR) END AS place_nickname,
         CASE WHEN c_custkey % 7 = 0 THEN n_name || ' תאי דואר' ELSE n_name END AS city_name,
         CASE WHEN c_custkey % 2 = 0 THEN 'הרצל' END AS street_name,
         CASE WHEN c_custkey % 4 = 0 THEN CAST(c_custkey % 100 AS VARCHAR) END AS house_num,
         CASE WHEN c_custkey % 5 = 0 THEN 'ללא כתובת'
              WHEN c_custkey % 5 = 1 THEN 'כניסה ' || CAST(c_custkey % 9 AS VARCHAR)
              WHEN c_custkey % 5 = 2 THEN n_name END AS alternate_address,
         CASE WHEN c_custkey % 6 = 0 THEN 'הוראות ' || CAST(c_custkey AS VARCHAR) END AS driving_instructions,
         CASE WHEN c_custkey % 2 = 0
              THEN '03-' || lpad(CAST(c_custkey % 9999999 AS VARCHAR), 7, '0') END AS phone,
         CASE WHEN c_custkey % 5 = 0 THEN '1;2'
              WHEN c_custkey % 5 = 1 THEN '3'
              WHEN c_custkey % 5 = 2 THEN '8'
              WHEN c_custkey % 5 = 3 THEN '9;2' END AS language,
         CASE WHEN c_custkey % 3 != 0
              THEN CAST(29.6 AS DOUBLE) + (c_custkey % 30) * CAST(0.1 AS DOUBLE) END AS latitude,
         CASE WHEN c_custkey % 3 != 0
              THEN CAST(34.3 AS DOUBLE) + (c_custkey % 25) * CAST(0.09 AS DOUBLE) END AS longitude
  FROM customer JOIN nation ON c_nationkey = n_nationkey CROSS JOIN ns
)"""

_LANGS_SQL = "['hebrew', 'arabic', 'russian', 'french', 'english', 'amharic', 'spanish']"

_LANG_SITS_SQL = f"""CASE WHEN language IS NOT NULL AND language <> '' THEN
  list_transform(list_filter(string_split(language, ';'), x -> x <> '8'),
    x -> 'human_situations:language:' ||
         CASE WHEN try_cast(trim(x) AS INT) BETWEEN 1 AND 7
              THEN ({_LANGS_SQL})[try_cast(trim(x) AS INT)]
              ELSE 'other' END || '_speaking')
END"""


def _clean_org_name_sql(expr: str) -> str:
    """SQL twin of functions/cleaning.py:clean_org_name, generated from the
    same suffix/stopword lists in the same interleaved order (q108
    discipline)."""
    from ..functions.cleaning import _ORG_STOPWORDS, _ORG_SUFFIXES  # noqa: PLC0415

    out = f"coalesce({expr}, '')"
    for sfx in _ORG_SUFFIXES:
        lit = sfx.replace("'", "''")
        out = f"replace({out}, '{lit}', '')"
        out = f"regexp_replace({out}, '^[,.()\\s]+|[,.()\\s]+$', '', 'g')"
    for word in _ORG_STOPWORDS:
        lit = word.replace("'", "''")
        out = f"replace({out}, '{lit}', '')"
    return f"regexp_replace({out}, '^[ \\-,\\n\\t]+|[ \\-,\\n\\t]+$', '', 'g')"


_DISCLAIMER_SQL = ENT.DISCLAIMER.replace("'", "''")

UNWIND_CTES = f"""
orgs_active AS (SELECT * FROM enriched WHERE status = 'ACTIVE'),
b_addr AS (
  SELECT b.*, o.name AS o_name, o.short_name AS o_short,
    CASE WHEN city_name IS NOT NULL THEN
      (CASE WHEN street_name IS NOT NULL
            THEN street_name || ' '
                 || (CASE WHEN house_num IS NOT NULL THEN house_num || ' ' ELSE '' END)
                 || ', '
            ELSE '' END)
      || replace(city_name, ' תאי דואר', '') || ' '
    ELSE '' END AS key0
  FROM gbranches b JOIN orgs_active o ON b.org_id = o.id
),
b_addr2 AS (
  SELECT *, nullif(trim(
    CASE WHEN alternate_address IS NOT NULL AND alternate_address <> 'ללא כתובת'
              AND NOT contains(key0, alternate_address)
         THEN key0 || ' - ' || alternate_address ELSE key0 END), '') AS address
  FROM b_addr
),
b_rows AS (
  SELECT 'guidestar:' || branch_id AS id,
         coalesce(place_nickname, coalesce(o_short, o_name) || ' - ' || city_name) AS name,
         [org_id] AS organization,
         address,
         driving_instructions AS address_details,
         CASE WHEN latitude IS NOT NULL AND longitude IS NOT NULL
              THEN {_olc_sql("latitude", "longitude")}
              ELSE address END AS location,
         CAST(NULL AS VARCHAR) AS description,
         phone AS phone_numbers,
         CAST(NULL AS VARCHAR) AS urls,
         {_LANG_SITS_SQL} AS situations
  FROM b_addr2
),
no_branch AS (
  SELECT o.id, o.name, o.kind, g.id AS gid, g.full_address
  FROM orgs_active o
  LEFT JOIN gs_details g ON o.id = g.id
  WHERE o.id NOT IN (SELECT DISTINCT org_id FROM gbranches)
),
fb_official AS (
  SELECT 'guidestar:' || id AS id, name, [id] AS organization,
         full_address AS address, CAST(NULL AS VARCHAR) AS address_details,
         full_address AS location, CAST(NULL AS VARCHAR) AS description,
         CAST(NULL AS VARCHAR) AS phone_numbers, CAST(NULL AS VARCHAR) AS urls,
         CAST(NULL AS VARCHAR[]) AS situations
  FROM no_branch WHERE full_address IS NOT NULL
),
fb_byname AS (
  SELECT 'budgetkey:' || id AS id, name, [id] AS organization,
         {_clean_org_name_sql("name")} AS address,
         CAST(NULL AS VARCHAR) AS address_details,
         {_clean_org_name_sql("name")} AS location,
         CAST(NULL AS VARCHAR) AS description,
         CAST(NULL AS VARCHAR) AS phone_numbers, CAST(NULL AS VARCHAR) AS urls,
         CAST(NULL AS VARCHAR[]) AS situations
  FROM no_branch
  WHERE full_address IS NULL AND gid IS NOT NULL
        AND kind NOT IN ('עמותה', 'חל"צ', 'הקדש')
),
national AS (
  SELECT 'national:' || id AS id, '' AS name, [id] AS organization,
         'שירות ארצי' AS address, CAST(NULL AS VARCHAR) AS address_details,
         'שירות ארצי' AS location, '{_DISCLAIMER_SQL}' AS description,
         CAST(NULL AS VARCHAR) AS phone_numbers, CAST(NULL AS VARCHAR) AS urls,
         CAST(NULL AS VARCHAR[]) AS situations
  FROM orgs_active
),
unwound AS (
  SELECT * FROM b_rows
  UNION ALL SELECT * FROM fb_official
  UNION ALL SELECT * FROM fb_byname
  UNION ALL SELECT * FROM national
)"""


def q127_entities_branches(spark, sf_dir):
    """SURVEY §3.2 stage 3 (reference entities/__init__.py:162-250): the
    unwind_branches UDTF as a three-way union — branch rows (address
    assembly, OLC location keys, language situations), the two no-branch
    fallbacks (official Guidestar address / cleaned-org-name), and the
    synthesized national: rows with the fixed disclaimer."""
    from ..operators.session_cache import keep_checkpointed_pooled  # noqa: PLC0415

    orgs = ENT.org_registry(spark, sf_dir)
    gs = ENT.guidestar_org_details(spark, sf_dir)
    bk = ENT.budgetkey_entities(spark, sf_dir)
    enriched = ENT.enrich_orgs(orgs, gs, bk)
    active = enriched.filter(F.col("status") == "ACTIVE")
    return stringify_arrays(
        keep_checkpointed_pooled(
            ENT.unwind_branches(active, ENT.guidestar_branches(spark, sf_dir), gs),
            "entities_unwound",
            eager=False,
        )
    )


Q127_SQL = scalarized_sql(
    f"""
WITH {_NS_CTE},
{ORG_REGISTRY_CTE.strip()},
{GS_DETAILS_CTE.strip()},
{BK_CTE.strip()},
{ENRICHED_CTE.strip()},
{GBRANCHES_CTE.strip()},
{UNWIND_CTES.strip()}
SELECT * FROM unwound
""",
    ["organization", "situations"],
)

EXT13_REGISTRY["q127_entities_branches"] = QueryDef(
    q127_entities_branches,
    Q127_SQL,
    "entities vertical: unwind_branches (synthesis + fallbacks + national)",
)


# ---------------------------------------------------------------------------
# q128 — unwind_services / process_service parity
# ---------------------------------------------------------------------------

GSERVICES_CTE = f"""
gservices AS (
  SELECT 'S' || CAST(p_partkey AS VARCHAR) AS service_id,
         {_ORG_ID_SQL.format(k="((p_partkey % ns.n) + 1)")} AS org_id,
         ((p_partkey % ns.n) + 1) AS org_k,
         CASE WHEN p_partkey % 7 = 3 THEN 'נדרש סיוע בדחיפות'
              ELSE 'שירות ' || p_name END AS service_name,
         CASE WHEN p_partkey % 3 = 0 THEN 'תיאור וולונטרי ' || CAST(p_partkey AS VARCHAR) END AS voluntary_description,
         CASE WHEN p_partkey % 2 = 0 THEN 'תיאור ' || CAST(p_partkey AS VARCHAR) END AS description,
         'T' || CAST(p_partkey % 10 AS VARCHAR) AS service_type_num,
         'טיפוס ' || CAST(p_partkey % 8 AS VARCHAR) AS service_type_name,
         CASE WHEN p_partkey % 4 = 0 THEN 'קהל1;קהל2'
              WHEN p_partkey % 4 = 1 THEN 'קהל3' ELSE '' END AS target_audience,
         CASE WHEN p_partkey % 6 = 0 THEN 'G' || CAST(p_partkey % 20 AS VARCHAR) END AS gov_id,
         CASE WHEN p_partkey % 6 = 0 THEN 'משרד ' || CAST(p_partkey % 3 AS VARCHAR) END AS office,
         CASE WHEN p_partkey % 5 = 0 THEN NULL
              WHEN p_partkey % 5 = 1 THEN 'Free service'
              WHEN p_partkey % 5 = 2 THEN 'Symbolic cost'
              WHEN p_partkey % 5 = 3 THEN 'Full payment'
              ELSE 'Government funded' END AS payment_method,
         CASE WHEN p_partkey % 3 = 1 THEN 'בתיאום מראש' END AS service_terms,
         CASE WHEN p_partkey % 8 = 0 THEN 'In Branches'
              WHEN p_partkey % 8 = 1 THEN 'Country wide'
              WHEN p_partkey % 8 = 2 THEN 'Customer Place;Program'
              WHEN p_partkey % 8 = 3 THEN 'Via Phone or Mail'
              WHEN p_partkey % 8 = 4 THEN 'Web Service;Customer Appointment'
              WHEN p_partkey % 8 = 5 THEN 'In Branches;Country wide'
              WHEN p_partkey % 8 = 6 THEN 'Not relevant'
              ELSE '' END AS area,
         CASE WHEN p_partkey % 5 = 0 THEN 'All Year'
              WHEN p_partkey % 5 = 1 THEN 'Requires Signup'
              WHEN p_partkey % 5 = 2 THEN 'Time Limited'
              WHEN p_partkey % 5 = 3 THEN 'Criteria Based' END AS when_active,
         CASE WHEN p_partkey % 6 = 0 THEN 'Phone'
              WHEN p_partkey % 6 = 1 THEN 'Chat / Email / Whatsapp;Internet'
              WHEN p_partkey % 6 = 2 THEN 'Zoom / Hybrid'
              WHEN p_partkey % 6 = 3 THEN 'Other'
              WHEN p_partkey % 6 = 4 THEN ''
              ELSE 'Phone;Other' END AS remote_delivery,
         CASE WHEN p_partkey % 9 = 0 THEN 'יונת דואר' END AS remote_delivery_other,
         CASE WHEN p_partkey % 7 = 0 THEN '2024-03-15T00:00:00.000Z' END AS start_date,
         CASE WHEN p_partkey % 7 = 1 THEN '2025-11-02T12:30:00.000Z' END AS end_date,
         CASE WHEN p_partkey % 4 = 0 THEN 'svc' || CAST(p_partkey AS VARCHAR) || '.org'
              WHEN p_partkey % 4 = 1 THEN 'https://x' || CAST(p_partkey AS VARCHAR) || '.org'
              WHEN p_partkey % 4 = 2 THEN 'junk url' END AS url,
         CASE WHEN p_partkey % 5 = 0 THEN '02-123' || CAST(p_partkey % 100 AS VARCHAR) END AS svc_phone,
         CASE WHEN p_partkey % 3 = 0 THEN 's' || CAST(p_partkey AS VARCHAR) || '@example.org' END AS svc_email
  FROM part CROSS JOIN ns
  WHERE ((p_partkey % ns.n) + 1) % 13 != 0 AND ((p_partkey % ns.n) + 1) % 11 != 0
)"""


def _tag_mapping_sql() -> str:
    """VALUES clause generated from pipelines.entities.TAG_ROWS — both
    engines read the same literal mapping."""
    vals = []
    for tag, resp, sits, status in ENT.TAG_ROWS:
        r = "[" + ", ".join(f"'{x}'" for x in resp) + "]"
        s = "[" + ", ".join(f"'{x}'" for x in sits) + "]"
        st = f"'{status}'" if status else "CAST(NULL AS VARCHAR)"
        vals.append(f"('{tag}', CAST({r} AS VARCHAR[]), CAST({s} AS VARCHAR[]), {st})")
    return (
        "tag_mapping(tag, response_ids, situation_ids, status) AS (SELECT * FROM (VALUES "
        + ", ".join(vals)
        + "))"
    )


def _case_map_sql(var: str, mapping: dict) -> str:
    branches = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items()
    )
    return f"CASE {var} {branches} END"


def _process_ctes() -> str:
    area_text = _case_map_sql("x", ENT.AREA_TEXT)
    remote_text = _case_map_sql("x", ENT.REMOTE_TEXT)
    when_text = _case_map_sql("when_active", ENT.WHEN_TEXT)
    national_keys = ", ".join(f"'{k}'" for k in ENT.AREA_TEXT if k != "In Branches")
    sep = "chr(10) || '<br/>' || chr(10)"
    return f"""
orgs_all_active AS (
  SELECT id FROM enriched WHERE status = 'ACTIVE'
  UNION ALL
  SELECT id FROM org_registry WHERE source <> 'entities' AND status = 'ACTIVE'
),
svc AS (
  SELECT g.* FROM gservices g JOIN orgs_all_active o ON g.org_id = o.id
),
actual AS (
  SELECT org_id, list_sort(list('guidestar:' || branch_id)) AS _actual
  FROM gbranches GROUP BY org_id
),
decl AS (
  SELECT g.service_id, list_sort(list('guidestar:' || b.branch_id)) AS _declared
  FROM svc g JOIN gbranches b ON g.org_id = b.org_id
  WHERE (try_cast(substr(b.branch_id, 2) AS INT)
         + try_cast(substr(g.service_id, 2) AS INT)) % 3 = 0
  GROUP BY g.service_id
),
with_tags AS (
  SELECT *, ([service_type_num, service_type_name]
             || string_split(coalesce(target_audience, ''), ';')
             || ['soproc:' || coalesce(gov_id, '')]) AS tags
  FROM svc
),
exm AS (
  SELECT e.service_id, e.tag, m.status, m.response_ids, m.situation_ids
  FROM (SELECT service_id, unnest(tags) AS tag FROM with_tags) e
  LEFT JOIN tag_mapping m ON e.tag = m.tag
),
per_svc AS (
  SELECT service_id,
         sum(CASE WHEN status = 'REJECTED' THEN 1 ELSE 0 END) AS n_rejected,
         list_sort(list_distinct(flatten(list(coalesce(response_ids, CAST([] AS VARCHAR[])))))) AS responses,
         list_sort(list_distinct(flatten(list(coalesce(situation_ids, CAST([] AS VARCHAR[])))))) AS situations,
         list_sort(list_distinct(list(CASE WHEN status IS NULL AND response_ids IS NULL
                                                AND tag <> '' THEN tag END))) AS unknown_tags
  FROM exm GROUP BY service_id
),
kept AS (
  SELECT w.*, p.responses, p.situations, p.unknown_tags,
         coalesce(d._declared, CAST([] AS VARCHAR[])) AS _declared,
         coalesce(a._actual, CAST([] AS VARCHAR[])) AS _actual
  FROM with_tags w
  JOIN per_svc p USING (service_id)
  LEFT JOIN decl d USING (service_id)
  LEFT JOIN actual a ON w.org_id = a.org_id
  WHERE p.n_rejected = 0 AND NOT contains(w.service_name, 'נדרש סיוע')
),
casc AS (
  SELECT *,
    CASE WHEN payment_method IS NULL OR payment_method = 'Free service' THEN 'no'
         ELSE 'yes' END AS payment_required,
    CASE WHEN payment_method = 'Symbolic cost' THEN 'עלות סמלית'
         WHEN payment_method = 'Full payment' THEN 'השירות ניתן בתשלום'
         WHEN payment_method = 'Government funded' THEN 'השירות מסובסד על ידי הממשלה'
         END AS pay0,
    string_split(coalesce(area, ''), ';') AS area_items,
    string_split(coalesce(remote_delivery, ''), ';') AS remote_items
  FROM kept
),
casc2 AS (
  SELECT *,
    CASE WHEN service_terms IS NOT NULL
         THEN CASE WHEN pay0 IS NOT NULL THEN pay0 || ', ' || service_terms
                   ELSE service_terms END
         ELSE pay0 END AS payment_details,
    list_filter(list_transform(area_items, x -> {area_text}), t -> t IS NOT NULL) AS area_texts,
    len(list_filter(area_items, x -> x IN ({national_keys}))) > 0 AS national,
    list_contains(area_items, 'In Branches') AS has_in_branches,
    list_filter(list_transform(remote_items, x -> {remote_text}), t -> t IS NOT NULL)
      || (CASE WHEN remote_delivery_other IS NOT NULL THEN [remote_delivery_other]
               ELSE CAST([] AS VARCHAR[]) END) AS methods
  FROM casc
),
casc3 AS (
  SELECT *,
    CASE WHEN len(area_texts) > 1 THEN 'השירות ניתן: ' || array_to_string(area_texts, ', ')
         WHEN len(area_texts) = 1 THEN 'השירות ניתן ' || area_texts[1] END AS area_detail,
    {when_text} AS when_detail,
    CASE WHEN len(methods) > 0
         THEN 'שירות מרחוק באמצעות: ' || array_to_string(methods, ', ') END AS remote_detail,
    CASE WHEN start_date IS NOT NULL
         THEN 'תאריך התחלה: ' || strftime(CAST(substr(start_date, 1, 19) AS TIMESTAMP), '%d/%m/%Y')
         END AS start_detail,
    CASE WHEN end_date IS NOT NULL
         THEN 'תאריך סיום: ' || strftime(CAST(substr(end_date, 1, 19) AS TIMESTAMP), '%d/%m/%Y')
         END AS end_detail,
    (CASE WHEN has_in_branches AND len(_declared) = 0 THEN _actual ELSE _declared END)
      || (CASE WHEN national THEN ['national:' || org_id] ELSE CAST([] AS VARCHAR[]) END)
      AS branches
  FROM casc2
),
processed AS (
  SELECT 'guidestar:' || service_id AS id,
         service_name AS name,
         coalesce(voluntary_description, description) AS description,
         coalesce(array_to_string(
           list_filter([area_detail, when_detail, remote_detail, start_detail, end_detail],
                       d -> d IS NOT NULL), {sep}), '') AS details,
         payment_required, payment_details,
         {_fix_url_sql("url")} || '#מידע נוסף על השירות' AS urls,
         situations, responses,
         CAST([] AS VARCHAR[]) AS organizations,
         branches,
         'מידע נוסף אפשר למצוא ב<a target="_blank" href="https://www.guidestar.org.il/organization/'
           || org_id || '/services">גיידסטאר - אתר העמותות של ישראל</a>' AS data_sources,
         CASE WHEN gov_id IS NOT NULL AND office IS NOT NULL
              THEN 'soproc:' || gov_id || '#' || office END AS implements,
         svc_phone AS phone_numbers,
         svc_email AS email_address,
         unknown_tags
  FROM casc3
  WHERE len(branches) > 0
)"""


def _entities_service_frames(spark, sf_dir):
    # session pools: q128/q129/q130 (and repeated searches) all consume the
    # processed-service pair — lineage-truncating checkpoints so each
    # consumer's plan (and its per-op analysis cost) bottoms out at the scan
    from ..operators.session_cache import keep_checkpointed_pooled  # noqa: PLC0415

    orgs = ENT.org_registry(spark, sf_dir)
    gs = ENT.guidestar_org_details(spark, sf_dir)
    bk = ENT.budgetkey_entities(spark, sf_dir)
    enriched = ENT.enrich_orgs(orgs, gs, bk)
    orgs_all_active = (
        enriched.select("id", "status")
        .unionByName(orgs.filter(F.col("source") != "entities").select("id", "status"))
        .filter(F.col("status") == "ACTIVE")
    )
    out, unknown = ENT.process_services(
        orgs_all_active,
        ENT.guidestar_services(spark, sf_dir),
        ENT.guidestar_branches(spark, sf_dir),
        ENT.taxonomy_mapping(spark),
    )
    return (
        keep_checkpointed_pooled(out, "entities_services", eager=False),
        keep_checkpointed_pooled(unknown, "entities_unknown_tags", eager=False),
    )


def q128_entities_services(spark, sf_dir):
    """SURVEY §3.2 stage 4 (reference entities/__init__.py:325-587):
    unwind_services + process_service — rejected-tag and "נדרש סיוע" drops,
    taxonomy union, the payment/area/when/remote enum cascades (asserts →
    raise_error), branch-list repair with national: synthesis, detail
    assembly, date formatting, url fixing — as one declarative plan."""
    out, _unknown = _entities_service_frames(spark, sf_dir)
    return stringify_arrays(out)


Q128_PREFIX = (
    f"WITH {_NS_CTE},\n{ORG_REGISTRY_CTE.strip()},\n{GS_DETAILS_CTE.strip()},\n"
    f"{BK_CTE.strip()},\n{ENRICHED_CTE.strip()},\n{GBRANCHES_CTE.strip()},\n"
    f"{GSERVICES_CTE.strip()},\n{_tag_mapping_sql()},\n{_process_ctes().strip()}"
)

Q128_SQL = scalarized_sql(
    Q128_PREFIX
    + """
SELECT id, name, description, details, payment_required, payment_details, urls,
       situations, responses, organizations, branches, data_sources, implements,
       phone_numbers, email_address
FROM processed
""",
    ["situations", "responses", "organizations", "branches"],
)

EXT13_REGISTRY["q128_entities_services"] = QueryDef(
    q128_entities_services,
    Q128_SQL,
    "entities vertical: process_service enum cascades + branch repair",
)


# ---------------------------------------------------------------------------
# q129 — the four staged merges, summarized; q130 — unknown-tag write-back
# ---------------------------------------------------------------------------


def q129_entities_staged(spark, sf_dir):
    """SURVEY §3.2 composed end-to-end: the four airtable_updater merges
    (org ids / enrichment patch-set / branches / services-with-soft-delete)
    chained through staging_upsert, summarized as one (merge, id, status,
    changed) row per written record. q126-q128 hash-gate the field values;
    this gates the MERGE semantics — skip, update, insert and soft-delete
    paths are all populated by the deterministic current-table
    perturbations."""
    staged = ENT.run_entities(spark, sf_dir)
    parts = []
    for name in ("org_ids", "org_enrich", "branches", "services"):
        parts.append(
            staged[name].select(
                F.lit(name).alias("merge"),
                "id",
                "status",
                F.col("_changed").alias("changed"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_ENRICH_FIELDS = [
    "kind", "name", "short_name", "description", "purpose",
    "urls", "phone_numbers", "email_address",
]
_BRANCH_FIELDS = [c for c in ENT.BRANCH_COLS if c != "id"]
_SERVICE_FIELDS = [c for c in ENT.SERVICE_COLS if c != "id"]


def _differs(fields: list[str], l: str = "f", r: str = "c") -> str:
    return " OR ".join(f"{l}.{x} IS DISTINCT FROM {r}.{x}" for x in fields)


_MERGE_CTES = f"""
m1 AS (
  SELECT 'org_ids' AS merge, id, 'ACTIVE' AS status, TRUE AS changed FROM gs_details
),
m2 AS (
  SELECT 'org_enrich' AS merge, e.id, 'ACTIVE' AS status,
         (o.status <> 'ACTIVE' OR {_differs(_ENRICH_FIELDS, "e", "o")}) AS changed
  FROM enriched e JOIN org_registry o ON e.id = o.id
),
cur_br AS (
  SELECT id,
         CASE WHEN right(id, 1) IN ('4','5','6') THEN 'ישן ' || name ELSE name END AS name,
         organization, address, address_details, location, description,
         phone_numbers, urls, situations
  FROM unwound WHERE right(id, 1) NOT IN ('7','8','9')
),
m3 AS (
  SELECT 'branches' AS merge, f.id, 'ACTIVE' AS status,
         (c.id IS NULL OR {_differs(_BRANCH_FIELDS)}) AS changed
  FROM unwound f LEFT JOIN cur_br c ON f.id = c.id
),
stale_svc AS (
  SELECT 'guidestar:SGONE' || CAST(p_partkey AS VARCHAR) AS id,
         'שירות שנעלם' AS name,
         CAST(NULL AS VARCHAR) AS description, CAST(NULL AS VARCHAR) AS details,
         CAST(NULL AS VARCHAR) AS payment_required, CAST(NULL AS VARCHAR) AS payment_details,
         CAST(NULL AS VARCHAR) AS urls,
         CAST(NULL AS VARCHAR[]) AS situations, CAST(NULL AS VARCHAR[]) AS responses,
         CAST(NULL AS VARCHAR[]) AS organizations, CAST(NULL AS VARCHAR[]) AS branches,
         CAST(NULL AS VARCHAR) AS data_sources, CAST(NULL AS VARCHAR) AS implements,
         CAST(NULL AS VARCHAR) AS phone_numbers, CAST(NULL AS VARCHAR) AS email_address
  FROM part WHERE p_partkey % 101 = 0
),
cur_svc AS (
  SELECT id,
         CASE WHEN right(id, 1) IN ('4','5','6') THEN 'ישן ' || name ELSE name END AS name,
         description, details, payment_required, payment_details, urls,
         situations, responses, organizations, branches, data_sources,
         implements, phone_numbers, email_address
  FROM processed WHERE right(id, 1) NOT IN ('7','8','9')
  UNION ALL SELECT * FROM stale_svc
),
m4 AS (
  SELECT 'services' AS merge, coalesce(f.id, c.id) AS id,
         CASE WHEN f.id IS NOT NULL THEN 'ACTIVE' ELSE 'INACTIVE' END AS status,
         (c.id IS NULL OR f.id IS NULL OR {_differs(_SERVICE_FIELDS)}) AS changed
  FROM processed f FULL OUTER JOIN cur_svc c ON f.id = c.id
)"""

Q129_SQL = (
    Q128_PREFIX
    + ",\n"
    + UNWIND_CTES.strip()
    + ",\n"
    + _MERGE_CTES.strip()
    + """
SELECT * FROM m1 WHERE changed
UNION ALL SELECT * FROM m2 WHERE changed
UNION ALL SELECT * FROM m3 WHERE changed
UNION ALL SELECT * FROM m4 WHERE changed
"""
)

EXT13_REGISTRY["q129_entities_staged"] = QueryDef(
    q129_entities_staged,
    Q129_SQL,
    "entities vertical: 4-way staged upsert composition (skip/update/insert/soft-delete)",
)


def q130_entities_unknown_tags(spark, sf_dir):
    """The curator feedback loop (reference entities/__init__.py:336-346):
    tags seen on surviving services with no taxonomy mapping are written back
    to the mapping table as empty rows for curators — surfaced here as
    (tag, n_services)."""
    _out, unknown = _entities_service_frames(spark, sf_dir)
    return unknown


Q130_SQL = (
    Q128_PREFIX
    + """
SELECT tag, CAST(count(*) AS BIGINT) AS n_services
FROM (SELECT unnest(unknown_tags) AS tag FROM kept)
GROUP BY tag
"""
)

EXT13_REGISTRY["q130_entities_unknown_tags"] = QueryDef(
    q130_entities_unknown_tags,
    Q130_SQL,
    "entities vertical: unknown-tag curator write-back",
)


# ---------------------------------------------------------------------------
# q136 — incremental branch refresh proven equal to the full unwind
# ---------------------------------------------------------------------------


def q136_entities_incremental(spark, sf_dir):
    """Incremental re-scrape of the entities vertical (the q93 discipline):
    only orgs in the changed slice re-unwind; unchanged orgs pass their
    previously staged rows through a broadcast anti-join. The prior table is
    deliberately STALE for the changed orgs ('OLD ' names), so the refresh
    only hash-matches the oracle — q127's full-unwind SQL verbatim — if the
    delta rebuild actually replaced every stale row. Shuffle tracks the
    change set, not the registry size."""
    return stringify_arrays(ENT.incremental_unwind_refresh(spark, sf_dir))


EXT13_REGISTRY["q136_entities_incremental"] = QueryDef(
    q136_entities_incremental,
    Q127_SQL,
    "entities vertical: incremental branch refresh == full recompute",
)
