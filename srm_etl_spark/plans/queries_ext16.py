"""Round-6 extension queries: the remaining reference source verticals,
composed as one table-driven family (the round-5 verdict's item 3).

q138 — the gov-source branch family (shil / tipat / gilzahav / revaha):
       four FIELD_MAP-driven dataflows pipelines re-expressed as flat
       selects over deterministic scrape fixtures, unioned by name
       (reference operators/shil/__init__.py:85-180, tipat:118-196,
       gilzahav:54-131, revaha:185-318).

Each oracle mirrors the fixture arithmetic 1:1 in SQL (the q108/q127
discipline); constants shared between engine and oracle come from ONE
literal table in pipelines/govsources.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling modules)

from ..pipelines import govsources as GOV
from ._scalar import scalarized_sql, stringify_arrays
from .queries import QueryDef
from .queries_ext import _olc_sql

# ---------------------------------------------------------------------------
# q138 — branch family union
# ---------------------------------------------------------------------------


def q138_branch_sources(spark, sf_dir):
    """SURVEY §3 remaining sources: shil/tipat/gilzahav/revaha branch tables
    as ONE parameterized vertical — FIELD_MAP selects (F29), ITM→WGS84 OLC
    location keys (F17/F20), ownership broadcast lookup (J6), comma-split
    phone unions, regex email extraction, HTML cleaning (F7), name-union
    concatenate (U1)."""
    return stringify_arrays(GOV.branch_sources_union(spark, sf_dir))


def _tipat_orgs_values() -> str:
    vals = ", ".join(f"('{k}', '{v}')" for k, v in GOV.TIPAT_ORGS.items())
    return f"tipat_orgs(ownership, org_id) AS (SELECT * FROM (VALUES {vals}))"


def _tipat_owner_case() -> str:
    owners = list(GOV.TIPAT_ORGS)
    branches = " ".join(
        f"WHEN c_custkey % 8 = {i} THEN '{name}'" for i, name in enumerate(owners[1:], 1)
    )
    return f"CASE {branches} ELSE '{owners[0]}' END"


_SHIL_LAT = (
    "(CAST(540000 + (s_suppkey * 53) % 160000 AS DOUBLE) - CAST(626907.39 AS DOUBLE))"
    " / CAST(110979.0 AS DOUBLE) + CAST(31.734394 AS DOUBLE)"
)
_SHIL_LON = (
    "(CAST(170000 + (s_suppkey * 37) % 50000 AS DOUBLE) - CAST(219529.584 AS DOUBLE))"
    " / CAST(93574.0 AS DOUBLE) + CAST(35.2045169 AS DOUBLE)"
)
_TIPAT_LAT = "CAST(31.0 AS DOUBLE) + CAST(c_custkey % 300 AS DOUBLE) * CAST(0.01 AS DOUBLE)"
_TIPAT_LON = "CAST(34.3 AS DOUBLE) + CAST(c_custkey % 240 AS DOUBLE) * CAST(0.015 AS DOUBLE)"

_REVAHA_SERVICES = (
    "list_filter(["
    "CASE WHEN (c_custkey % 7 != 2) AND (c_custkey % 5 = 0) THEN 'revaha-noshmim' END, "
    "CASE WHEN (c_custkey % 7 != 2) AND (c_custkey % 3 = 0) THEN 'revaha-otzma' END"
    "], x -> x IS NOT NULL) || "
    + "["
    + ", ".join(f"'{s}'" for s in GOV.REVAHA_BASE_SERVICES)
    + "]"
)


def _q138_sql() -> str:
    shil_addr = """
      CASE WHEN (s_suppkey % 6 != 0) AND (s_suppkey % 9 > 0)
           THEN 'רחוב ' || CAST(s_suppkey % 50 AS VARCHAR) || ' ' || CAST(s_suppkey % 9 AS VARCHAR)
                || ', ' || 'עיר ' || CAST(s_suppkey % 30 AS VARCHAR)
           WHEN s_suppkey % 6 != 0
           THEN 'רחוב ' || CAST(s_suppkey % 50 AS VARCHAR) || ', עיר ' || CAST(s_suppkey % 30 AS VARCHAR)
           ELSE 'רחוב ' || CAST(s_suppkey % 50 AS VARCHAR) END"""
    tipat_addr = """
      CASE WHEN code = 'national' THEN 'שירות ארצי'
           WHEN city_name IS NOT NULL AND street_name IS NOT NULL AND building_num > 0
           THEN street_name || ' ' || CAST(building_num AS VARCHAR) || ', ' || city_name
           WHEN city_name IS NOT NULL AND street_name IS NOT NULL
           THEN street_name || ', ' || city_name
           WHEN city_name IS NOT NULL THEN city_name
           ELSE district END"""
    return f"""
WITH shil AS (
  SELECT '{GOV.SHIL_SOURCE}' AS source,
         '{GOV.SHIL_SOURCE}:' || CAST(s_suppkey AS VARCHAR) AS id,
         'תחנה ' || CAST(s_suppkey AS VARCHAR) AS name,
         ['{GOV.WELFARE_ORG_ID}'] AS organization,
         ['{GOV.SHIL_SERVICE_ID}'] AS services,
         '{GOV.SHIL_OPERATING_UNIT.replace("'", "''")}' AS operating_unit,
         ({shil_addr}) AS address,
         CASE WHEN s_suppkey % 2 = 0
              THEN {_olc_sql(_SHIL_LAT, _SHIL_LON)}
              ELSE ({shil_addr}) END AS location,
         CASE WHEN s_suppkey % 7 = 0 THEN 'קומה 2' END AS address_details,
         'ייעוץ חינם' || chr(10) || 'פריט ' || CAST(s_suppkey AS VARCHAR) AS description,
         concat_ws(chr(10),
           CASE WHEN s_suppkey % 3 != 0 THEN '02-5' || CAST(s_suppkey % 1000 AS VARCHAR) END,
           CASE WHEN s_suppkey % 4 = 0 THEN '050-' || CAST(s_suppkey AS VARCHAR) END) AS phone_numbers,
         CASE WHEN s_suppkey % 5 != 0
              THEN 's' || CAST(s_suppkey AS VARCHAR) || '@shil.org' END AS email_address,
         '{GOV.SHIL_ITEM_URL_BASE}/station-' || CAST(s_suppkey AS VARCHAR)
           || '#תחנה ' || CAST(s_suppkey AS VARCHAR) AS urls
  FROM supplier
),
{_tipat_orgs_values()},
tipat_stations AS (
  SELECT CAST(c_custkey AS VARCHAR) AS code,
         'טיפת חלב ' || CAST(c_custkey AS VARCHAR) AS station_name,
         {_tipat_owner_case()} AS ownership,
         CASE WHEN c_custkey % 3 = 0 THEN 'הערה ' || CAST(c_custkey AS VARCHAR) END AS remarks,
         CASE WHEN c_custkey % 4 = 1 THEN 'ליד הדואר' END AS address_comments,
         CASE WHEN c_custkey % 2 = 0 THEN '04-8' || CAST(c_custkey % 10000 AS VARCHAR) END AS phone1,
         CASE WHEN c_custkey % 6 = 0
              THEN 't' || CAST(c_custkey AS VARCHAR) || '@health.gov.il' END AS email,
         'מחוז ' || CAST(c_custkey % 6 AS VARCHAR) AS district,
         CASE WHEN c_custkey % 7 != 0 THEN 'עיר ' || CAST(c_custkey % 40 AS VARCHAR) END AS city_name,
         CASE WHEN c_custkey % 5 != 0 THEN 'רחוב ' || CAST(c_custkey % 60 AS VARCHAR) END AS street_name,
         c_custkey % 12 AS building_num,
         CASE WHEN c_custkey % 3 = 0 THEN {_TIPAT_LAT} END AS lat,
         CASE WHEN c_custkey % 3 = 0 THEN {_TIPAT_LON} END AS lon
  FROM customer WHERE c_custkey % 5 != 4
),
tipat_all AS (
  SELECT * FROM tipat_stations
  UNION ALL
  SELECT 'national', 'טיפת חלב - מוקד טלפוני', 'משרד הבריאות',
         NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
),
tipat AS (
  SELECT '{GOV.TIPAT_SOURCE}' AS source,
         '{GOV.TIPAT_SOURCE}:' || code AS id,
         station_name AS name,
         [o.org_id] AS organization,
         [CASE WHEN code = 'national' THEN '{GOV.TIPAT_SERVICE_NATIONAL}'
               ELSE '{GOV.TIPAT_SERVICE_LOCAL}' END] AS services,
         CAST(NULL AS VARCHAR) AS operating_unit,
         ({tipat_addr}) AS address,
         CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
              THEN {_olc_sql("lat", "lon")}
              ELSE ({tipat_addr}) END AS location,
         address_comments AS address_details,
         remarks AS description,
         phone1 AS phone_numbers,
         email AS email_address,
         CASE WHEN code != 'national'
              THEN '{GOV.TIPAT_ITEM_URL_BASE}' || code END AS urls
  FROM tipat_all t LEFT JOIN tipat_orgs o USING (ownership)
),
gilzahav AS (
  SELECT '{GOV.GILZAHAV_SOURCE}' AS source,
         '{GOV.GILZAHAV_SOURCE}:' || CAST(s_suppkey + 9000 AS VARCHAR) AS id,
         'בית גיל זהב ' || CAST(s_suppkey AS VARCHAR) AS name,
         ['{GOV.GILZAHAV_ORG_ID}'] AS organization,
         ['{GOV.GILZAHAV_SERVICE_ID}'] AS services,
         'חברה ' || CAST(s_suppkey % 5 AS VARCHAR) AS operating_unit,
         'רחוב ' || CAST(s_suppkey % 70 AS VARCHAR) || ' ' || CAST(s_suppkey % 9 + 1 AS VARCHAR)
           || ', עיר-' || CAST(s_suppkey % 40 AS VARCHAR) AS address,
         'רחוב ' || CAST(s_suppkey % 70 AS VARCHAR) || ' ' || CAST(s_suppkey % 9 + 1 AS VARCHAR)
           || ', עיר-' || CAST(s_suppkey % 40 AS VARCHAR) AS location,
         CAST(NULL AS VARCHAR) AS address_details,
         'מספר יחידות דיור: ' || CAST(s_suppkey % 200 + 10 AS VARCHAR) || chr(10) ||
           CASE WHEN s_suppkey % 3 = 2
                THEN 'מספר ממתינים: ' || CAST(s_suppkey % 50 AS VARCHAR) || chr(10)
                ELSE '' END AS description,
         CASE WHEN s_suppkey % 2 = 0 THEN '08-9' || CAST(s_suppkey % 1000 AS VARCHAR) END AS phone_numbers,
         CASE WHEN s_suppkey % 3 = 0
              THEN 'gz' || CAST(s_suppkey AS VARCHAR) || '@moch.gov.il' END AS email_address,
         CAST(NULL AS VARCHAR) AS urls
  FROM supplier
),
revaha AS (
  SELECT '{GOV.REVAHA_SOURCE}' AS source,
         '{GOV.REVAHA_SOURCE}:' || CAST(c_custkey + 300 AS VARCHAR) AS id,
         '' AS name,
         ['{GOV.WELFARE_ORG_ID}'] AS organization,
         ({_REVAHA_SERVICES}) AS services,
         '{GOV.REVAHA_OPERATING_UNIT}' AS operating_unit,
         'כתובת ' || CAST(c_custkey % 80 AS VARCHAR) AS address,
         'כתובת ' || CAST(c_custkey % 80 AS VARCHAR) AS location,
         CAST(NULL AS VARCHAR) AS address_details,
         CAST(NULL AS VARCHAR) AS description,
         replace(array_to_string(
           string_split(coalesce(CASE WHEN c_custkey % 3 = 0
               THEN '08-6 ' || CAST(c_custkey % 100 AS VARCHAR) END, ''), ',')
           || string_split(coalesce(
               CASE WHEN c_custkey % 2 = 0
                    THEN '02-1' || CAST(c_custkey % 100 AS VARCHAR) || ', 02-2' || CAST(c_custkey % 77 AS VARCHAR)
                    WHEN c_custkey % 5 = 1 THEN NULL
                    ELSE '02-1' || CAST(c_custkey % 100 AS VARCHAR) END, ''), ','),
           chr(10)), ' ', '') AS phone_numbers,
         nullif(regexp_extract(coalesce(
           CASE WHEN c_custkey % 4 = 0
                THEN 'צרו קשר: rev' || CAST(c_custkey AS VARCHAR) || '@molsa.gov.il בלבד'
                WHEN c_custkey % 4 = 1 THEN 'אין' END, ''),
           '[\\w.+-]+@[\\w-]+\\.[\\w.-]+', 0), '') AS email_address,
         '{GOV.REVAHA_BASE_URL}#{GOV.REVAHA_BRANCH_NAME_PREFIX}' AS urls
  FROM customer
)
SELECT * FROM shil
UNION ALL SELECT * FROM tipat
UNION ALL SELECT * FROM gilzahav
UNION ALL SELECT * FROM revaha
"""


Q138_SQL = scalarized_sql(_q138_sql(), ["organization", "services"])

# ---------------------------------------------------------------------------
# q139 — soproc click scraper (Solr suffix concatenate + clean + filters +
# detail assembly; reference operators/soproc/click_scraper.py:8-151)
# ---------------------------------------------------------------------------


def q139_click_scrape(spark, sf_dir):
    """soproc click vertical: schema-time Solr-suffix concatenate (U1 with
    DT_SUFFIXES priority + NO_LISTS skip), per-cell base64-or-passthrough
    (F8) + HTML sanitize (F7) + NULL-string scrub with genuine nulls
    preserved, he/type-1/grouped/channel-1 filters, <p>-paragraph detail
    assembly that OMITS null fields, deductible enum map, joined-name
    strip."""
    return GOV.click_scrape(spark, sf_dir)


def _q139_sql() -> str:
    # Mirrors the click_raw fixture arithmetic through the reference
    # pipeline's semantics in closed form (the q108/q138 no-drift
    # discipline): each detail paragraph appears only when its source cell
    # is genuinely non-null; the base64-packed Description decodes and
    # sanitizes to plain text; 'NULL' strings scrub to SQL NULL.
    k = "p_partkey"
    dedu = GOV.CLICK_DEDUCTIBLE_TYPE
    d_items = list(dedu.items())
    return f"""
SELECT CAST({k} AS INT) AS catalog_number,
       'שירות קליק ' || CAST({k} % 500 AS VARCHAR) AS name,
       'תקציר ' || CAST({k} AS VARCHAR) AS description,
       '<p>תקציר ' || CAST({k} AS VARCHAR) || '</p>'
         || '<p>תיאור מלא ' || CAST({k} AS VARCHAR) || '</p>'
         || CASE WHEN {k} % 3 = 0 THEN '<p>שלב א. שלב ב</p>' ELSE '' END
         || CASE WHEN {k} % 4 = 0
                 THEN '<p>קהילה ' || CAST({k} % 6 AS VARCHAR) || '</p>' ELSE '' END
         || CASE WHEN {k} % 5 = 0 THEN '<p>שנה</p>' ELSE '' END AS details,
       CASE WHEN {k} % 4 = 1 THEN '{d_items[0][1]}'
            WHEN {k} % 4 = 2 THEN '{d_items[1][1]}'
            WHEN {k} % 4 = 3 AND {k} % 8 = 3 THEN '{d_items[2][1]}'
            END AS payment_required,
       CASE WHEN {k} % 11 = 4 THEN NULL
            WHEN {k} % 3 = 1 THEN 'עד 100 ש"ח' END AS payment_details,
       CAST(NULL AS VARCHAR) AS data_sources,
       CAST(NULL AS VARCHAR) AS urls
FROM part
WHERE {k} % 6 != 5    -- lang_code = 'he'
  AND {k} % 9 != 7    -- type = 1
  AND {k} % 8 != 6    -- group_id IS NOT NULL (null survives cleaning)
  AND {k} % 7 != 5    -- distribution_channel[0] = 1
"""


EXT16_REGISTRY = {
    "q138_branch_sources": QueryDef(
        q138_branch_sources,
        Q138_SQL,
        "gov-source branch family (shil/tipat/gilzahav/revaha, table-driven)",
    ),
    "q139_click_scrape": QueryDef(
        q139_click_scrape,
        _q139_sql(),
        "soproc click scraper (suffix concatenate, base64+HTML clean, filters)",
    ),
}
