"""Round-5 extension queries, part 3: manual-data-entry + curation-import
compositions (the round-4 verdict's item 8).

q134 — external manual data entry (reference
       operators/manual_data_entry/external.py:23-131): sheet registry →
       per-sheet row normalization with the org-defaults cascade and
       per-sheet _row_id enumeration → Categories taxonomy union.
q135 — from_curation import (reference operators/derive/from_curation.py:
       16-190): decision write-back, status/decision/linkage gates, the
       location record-key rewrite, and the two-level FK remap with the
       drop-unmapped-links rule.

Oracles mirror pipelines/mde.py's fixtures; the Categories VALUES clause is
generated from the same MDE_TAG_ROWS literal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..pipelines import mde as MDE
from ._scalar import scalarized_sql, stringify_arrays
from .queries import QueryDef

# ---------------------------------------------------------------------------
# q134 — external manual data entry
# ---------------------------------------------------------------------------

SHEETS_CTE = """
sheets AS (
  SELECT 'sheet://' || CAST(n_nationkey AS VARCHAR) AS sheet_url,
         CASE WHEN n_nationkey % 5 = 4 THEN 'מושהה' ELSE 'בייצור' END AS status,
         'מקור ' || n_name AS source_name,
         'ארגון ברירת מחדל ' || CAST(n_nationkey AS VARCHAR) AS org_name,
         CASE WHEN n_nationkey % 2 = 0 THEN 'קיצור' || CAST(n_nationkey AS VARCHAR) END AS org_short_name,
         '58000000' || CAST(n_nationkey % 10 AS VARCHAR) AS org_id,
         '02-555000' || CAST(n_nationkey % 10 AS VARCHAR) AS org_phone,
         CAST(NULL AS VARCHAR) AS org_email,
         CAST(NULL AS VARCHAR) AS org_website,
         CASE WHEN n_nationkey % 3 != 0 THEN 'כתובת ' || n_name END AS branch_address
  FROM nation
)"""

SHEET_ROWS_CTE = """
sheet_rows AS (
  SELECT 'sheet://' || CAST(c_nationkey AS VARCHAR) AS sheet_url,
         c_custkey AS pos,
         CASE WHEN c_custkey % 11 = 5 THEN ''
              ELSE 'שירות חיצוני ' || CAST(c_custkey AS VARCHAR) END AS service_name,
         CASE WHEN c_custkey % 4 = 0 THEN 'מוכן לפרסום' ELSE 'טיוטה' END AS row_status,
         CASE WHEN c_custkey % 2 = 0
              THEN 'רחוב העצמאות ' || CAST(c_custkey % 90 AS VARCHAR) END AS service_address,
         'תיאור ' || CAST(c_custkey AS VARCHAR) AS service_description,
         CASE WHEN c_custkey % 3 = 0 THEN 'בתיאום' END AS service_conditions,
         CASE WHEN c_custkey % 5 = 0
              THEN '02-600' || CAST(c_custkey % 1000 AS VARCHAR) END AS service_phone,
         CASE WHEN c_custkey % 4 = 1
              THEN 'x' || CAST(c_custkey AS VARCHAR) || '.org' END AS service_website,
         CASE WHEN c_custkey % 6 = 0
              THEN 'm' || CAST(c_custkey AS VARCHAR) || '@x.org' END AS service_email,
         CASE WHEN c_custkey % 3 = 0
              THEN 'מפעיל ' || CAST(c_custkey AS VARCHAR) END AS operator_name,
         CASE WHEN c_custkey % 9 = 0 THEN 'יוזמה פרטית'
              WHEN c_custkey % 9 = 3 THEN ''
              ELSE '5800' || lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') END AS operator_id,
         CASE WHEN c_custkey % 2 = 0
              THEN '03-777' || CAST(c_custkey % 100 AS VARCHAR) END AS operator_phone,
         CASE WHEN c_custkey % 4 = 0
              THEN 'op' || CAST(c_custkey AS VARCHAR) || '@x.org' END AS operator_email,
         CASE WHEN c_custkey % 5 = 0
              THEN 'op' || CAST(c_custkey AS VARCHAR) || '.org' END AS operator_website,
         'קטגוריה ' || CAST(c_custkey % 6 AS VARCHAR) AS category,
         'אוכלוסייה ' || CAST(c_custkey % 4 AS VARCHAR) AS audience,
         CASE WHEN c_custkey % 3 = 0 THEN 'ערבית' ELSE 'עברית' END AS language,
         CASE WHEN c_custkey % 5 = 0 THEN 'רוסית' END AS language2,
         CASE WHEN c_custkey % 7 = 0 THEN 'קהל א, קהל ב' END AS target_audiences,
         (c_custkey % 8 = 0) AS emergency,
         CASE WHEN c_custkey % 5 = 2 THEN 'הערה ' || CAST(c_custkey AS VARCHAR) END AS notes_raw
  FROM customer
)"""


def _mde_tags_sql() -> str:
    vals = []
    for tag, resp, sits in MDE.MDE_TAG_ROWS:
        r = "CAST([" + ", ".join(f"'{x}'" for x in resp) + "] AS VARCHAR[])"
        s = "CAST([" + ", ".join(f"'{x}'" for x in sits) + "] AS VARCHAR[])"
        vals.append(f"('{tag}', {r}, {s})")
    return (
        "categories(tag, response_ids, situation_ids) AS (SELECT * FROM (VALUES "
        + ", ".join(vals)
        + "))"
    )


MDE_BASE_CTE = """
mde_join AS (
  SELECT r.*, s.source_name, s.org_name AS def_org_name, s.org_short_name AS def_short,
         s.org_id AS def_org_id, s.org_phone AS def_phone, s.org_email AS def_email,
         s.org_website AS def_website, s.branch_address AS def_address
  FROM sheet_rows r
  JOIN sheets s USING (sheet_url)
  WHERE s.status = 'בייצור' AND r.service_name <> '' AND r.row_status = 'מוכן לפרסום'
),
-- enumerate BEFORE the falsy-org-id drop (reference external.py:35 vs :55-56):
-- a dropped row still consumes its per-sheet index
mde_enum AS (
  SELECT *, sheet_url || '#' || CAST(row_number() OVER (PARTITION BY sheet_url ORDER BY pos) - 1 AS VARCHAR) AS _row_id
  FROM mde_join
),
mde_base AS (
  SELECT _row_id,
         coalesce(service_address, def_address) AS branch_address,
         service_name, service_description, service_conditions,
         service_phone, service_website, service_email,
         CASE WHEN operator_name IS NOT NULL THEN operator_name ELSE def_org_name END AS org_name,
         CASE WHEN operator_name IS NOT NULL THEN NULL ELSE def_short END AS org_short_name,
         CASE WHEN operator_name IS NOT NULL
              THEN (CASE WHEN trim(operator_id) = 'יוזמה פרטית' THEN NULL ELSE operator_id END)
              ELSE def_org_id END AS org_id,
         CASE WHEN operator_name IS NOT NULL THEN operator_phone ELSE def_phone END AS org_phone,
         CASE WHEN operator_name IS NOT NULL THEN operator_email ELSE def_email END AS org_email,
         CASE WHEN operator_name IS NOT NULL THEN operator_website ELSE def_website END AS org_website,
         source_name AS data_source,
         [category, audience, language, language2] AS taxonomies,
         target_audiences,
         trim(CASE WHEN emergency
                   THEN coalesce(notes_raw, '') || chr(10) || chr(10) || 'יש לתייג כשירות חירום'
                   ELSE coalesce(notes_raw, '') END) AS notes
  FROM mde_enum
  WHERE NOT (operator_name IS NOT NULL AND (operator_id IS NULL OR operator_id = ''))
),
mde_tagged AS (
  SELECT b._row_id,
         list_sort(list_distinct(flatten(list(coalesce(c.response_ids, CAST([] AS VARCHAR[])))))) AS responses_ids,
         list_sort(list_distinct(flatten(list(coalesce(c.situation_ids, CAST([] AS VARCHAR[])))))) AS situations_ids
  FROM (SELECT _row_id, trim(unnest(taxonomies)) AS tag FROM mde_base) e
  JOIN mde_base b USING (_row_id)
  LEFT JOIN categories c ON e.tag = c.tag
  WHERE e.tag IS NOT NULL
  GROUP BY b._row_id
)"""


def q134_external_mde(spark, sf_dir):
    """External manual data entry (reference external.py:23-131) composed:
    ready sheets -> ready rows with a service name -> org-defaults fallback
    cascade ('יוזמה פרטית' nulls the org id; '' drops the row) -> per-sheet
    0-based _row_id enumeration of surviving rows -> Categories taxonomy
    union (sorted; the reference materializes an unordered set) -> the
    emergency-note append."""
    out = MDE.external_mde(
        MDE.mde_sheets(spark, sf_dir),
        MDE.mde_sheet_rows(spark, sf_dir),
        MDE.mde_categories(spark),
    )
    return stringify_arrays(
        out.select(
            "_row_id", "branch_address", "service_name", "service_description",
            "service_conditions", "service_phone", "service_website", "service_email",
            "org_name", "org_short_name", "org_id", "org_phone", "org_email",
            "org_website", "data_source", "target_audiences", "notes",
            "responses_ids", "situations_ids",
        )
    )


Q134_SQL = f"""
WITH {SHEETS_CTE.strip()},
{SHEET_ROWS_CTE.strip()},
{_mde_tags_sql()},
{MDE_BASE_CTE.strip()}
SELECT b._row_id, branch_address, service_name, service_description,
       service_conditions, service_phone, service_website, service_email,
       org_name, org_short_name, org_id, org_phone, org_email, org_website,
       data_source, target_audiences, notes,
       coalesce(t.responses_ids, CAST([] AS VARCHAR[])) AS responses_ids,
       coalesce(t.situations_ids, CAST([] AS VARCHAR[])) AS situations_ids
FROM mde_base b LEFT JOIN mde_tagged t USING (_row_id)
"""

Q134_SQL = scalarized_sql(Q134_SQL, ["responses_ids", "situations_ids"])

EXT15_REGISTRY = {
    "q134_external_mde": QueryDef(
        q134_external_mde, Q134_SQL,
        "external manual-data-entry flow (sheet fan-out + org cascade + taxonomy union)",
    ),
}


# ---------------------------------------------------------------------------
# q135 — from_curation import
# ---------------------------------------------------------------------------

CURATION_CTES = """
nsup AS (SELECT count(*) AS n FROM supplier),
ncust AS (SELECT count(*) AS n FROM customer),
cur_orgs AS (
  SELECT 'c-org-' || CAST(s_suppkey AS VARCHAR) AS id,
         'ארגון אצור ' || CAST(s_suppkey AS VARCHAR) AS name,
         CASE WHEN s_suppkey % 6 = 5 THEN 'INACTIVE' ELSE 'ACTIVE' END AS status,
         CASE WHEN s_suppkey % 7 = 0 THEN NULL
              WHEN s_suppkey % 7 = 1 THEN 'Rejected'
              WHEN s_suppkey % 7 = 2 THEN 'Suspended'
              ELSE 'Approved' END AS decision,
         CASE WHEN s_suppkey % 3 != 1 THEN ['c-sv-x' || CAST(s_suppkey AS VARCHAR)]
              ELSE CAST([] AS VARCHAR[]) END AS services,
         CASE WHEN s_suppkey % 5 = 0 THEN ['bs'] ELSE CAST([] AS VARCHAR[]) END AS branch_services
  FROM supplier
),
cur_branches AS (
  SELECT 'c-br-' || CAST(c_custkey AS VARCHAR) AS id,
         'סניף אצור ' || CAST(c_custkey AS VARCHAR) AS name,
         ['c-org-' || CAST((c_custkey % nsup.n) + 1 AS VARCHAR)] AS organization,
         'loc-' || CAST(c_custkey % 30 AS VARCHAR) AS location,
         CASE WHEN c_custkey % 6 = 5 THEN 'INACTIVE' ELSE 'ACTIVE' END AS status,
         CASE WHEN c_custkey % 7 = 0 THEN NULL
              WHEN c_custkey % 7 = 1 THEN 'Rejected'
              WHEN c_custkey % 7 = 2 THEN 'Suspended'
              ELSE 'Approved' END AS decision,
         CASE WHEN c_custkey % 4 != 1 THEN ['s'] ELSE CAST([] AS VARCHAR[]) END AS services,
         CASE WHEN c_custkey % 8 = 0 THEN ['os'] ELSE CAST([] AS VARCHAR[]) END AS org_services
  FROM customer CROSS JOIN nsup
),
cur_services AS (
  SELECT 'c-sv-' || CAST(p_partkey AS VARCHAR) AS id,
         'שירות אצור ' || CAST(p_partkey AS VARCHAR) AS name,
         ['c-org-' || CAST((p_partkey % nsup.n) + 1 AS VARCHAR)] AS organizations,
         ['c-br-' || CAST((p_partkey % ncust.n) + 1 AS VARCHAR)] AS branches,
         CASE WHEN p_partkey % 6 = 5 THEN 'INACTIVE' ELSE 'ACTIVE' END AS status,
         CASE WHEN p_partkey % 7 = 0 THEN NULL
              WHEN p_partkey % 7 = 1 THEN 'Rejected'
              WHEN p_partkey % 7 = 2 THEN 'Suspended'
              ELSE 'Approved' END AS decision,
  FROM part CROSS JOIN nsup CROSS JOIN ncust
),
imp_orgs AS (
  SELECT * FROM cur_orgs
  WHERE status = 'ACTIVE' AND (decision IS NULL OR decision NOT IN ('Rejected', 'Suspended'))
        AND (len(services) > 0 OR len(branch_services) > 0)
),
imp_br0 AS (
  SELECT b.*,
         [CASE WHEN try_cast(substr(b.location, 5) AS INT) % 2 = 0
               THEN 'recloc-' || substr(b.location, 5) ELSE b.location END] AS location_arr,
         CASE WHEN o.id IS NOT NULL THEN ['rec-' || o.id] ELSE CAST([] AS VARCHAR[]) END AS org_links
  FROM (SELECT * FROM cur_branches
        WHERE status = 'ACTIVE' AND (decision IS NULL OR decision NOT IN ('Rejected', 'Suspended'))
              AND (len(services) > 0 OR len(org_services) > 0)) b
  LEFT JOIN imp_orgs o ON b.organization[1] = o.id
),
imp_branches AS (SELECT * FROM imp_br0 WHERE len(org_links) > 0),
imp_sv0 AS (
  SELECT s.*,
         CASE WHEN o.id IS NOT NULL THEN ['rec-' || o.id] ELSE CAST([] AS VARCHAR[]) END AS org_links,
         CASE WHEN b.id IS NOT NULL THEN ['rec-' || b.id] ELSE CAST([] AS VARCHAR[]) END AS br_links
  FROM (SELECT * FROM cur_services
        WHERE status = 'ACTIVE' AND (decision IS NULL OR decision NOT IN ('Rejected', 'Suspended'))) s
  LEFT JOIN imp_orgs o ON s.organizations[1] = o.id
  LEFT JOIN imp_branches b ON s.branches[1] = b.id
),
imp_services AS (SELECT * FROM imp_sv0 WHERE len(org_links) > 0 OR len(br_links) > 0),
writeback AS (
  SELECT 'organizations/' || id AS id FROM cur_orgs WHERE decision IS NULL
  UNION ALL SELECT 'branches/' || id FROM cur_branches WHERE decision IS NULL
  UNION ALL SELECT 'services/' || id FROM cur_services WHERE decision IS NULL
)"""


def q135_curation_import(spark, sf_dir):
    """from_curation (reference from_curation.py:16-190) composed: the
    decision='New' write-back, the ACTIVE + not-Rejected/Suspended + linkage
    gates per table, the location record-key rewrite, and the two-level FK
    remap where links to non-imported rows are DROPPED (filter_by_items) and
    services survive only with at least one valid end."""
    out = MDE.run_curation_import(spark, sf_dir)
    wb = out["writeback"].select(
        F.lit("writeback").alias("stage"),
        F.concat(F.col("table"), F.lit("/"), F.col("id")).alias("id"),
        F.lit(None).cast("string").alias("name"),
        F.lit("New").alias("decision"),
        F.lit(None).cast("array<string>").alias("links"),
    )
    orgs = out["organizations"].select(
        F.lit("organizations").alias("stage"), "id", "name", "decision",
        F.lit(None).cast("array<string>").alias("links"),
    )
    br = out["branches"].select(
        F.lit("branches").alias("stage"), "id", "name", "decision",
        F.concat(F.col("organization"), F.col("location")).alias("links"),
    )
    sv = out["services"].select(
        F.lit("services").alias("stage"), "id", "name", "decision",
        F.concat(F.col("organizations"), F.col("branches")).alias("links"),
    )
    return stringify_arrays(wb.unionByName(orgs).unionByName(br).unionByName(sv))


Q135_SQL = f"""
WITH {CURATION_CTES.strip()}
SELECT 'writeback' AS stage, id, CAST(NULL AS VARCHAR) AS name, 'New' AS decision,
       CAST(NULL AS VARCHAR[]) AS links
FROM writeback
UNION ALL
SELECT 'organizations', id, name, decision, CAST(NULL AS VARCHAR[]) FROM imp_orgs
UNION ALL
SELECT 'branches', id, name, decision, org_links || location_arr FROM imp_branches
UNION ALL
SELECT 'services', id, name, decision, org_links || br_links FROM imp_services
"""

Q135_SQL = scalarized_sql(Q135_SQL, ["links"])

EXT15_REGISTRY["q135_curation_import"] = QueryDef(
    q135_curation_import, Q135_SQL,
    "from_curation import (decision write-back + gates + two-level FK remap)",
)
