"""Round-7 extension queries: the day_care / child_care / kolzchut_orgs
source verticals (reference operators/day_care/*, child_care/*,
kolzchut_orgs/__init__.py) — closing SURVEY §3's source coverage.

q144 — day_care branch payload: type filter, phone digit-scrub + length
       gate + leading-0 fix, 13-digit ח.פ trim, council-prefix expansion,
       the organization matcher (normalize/direct/hyphen-swap, broadcast),
       hash id, space-joined address, manager\\nsymbol description.
q145 — day_care organization payload: kind by council regex, matched
       rec-id override of the ח.פ, id-length gate.
q146 — child_care service payload: last-5-chars hash id, sector→situations
       map (literal order), sector-conditional details.
q147 — kolzchut_orgs: sorted-distinct org numbers + tag date.

Oracles mirror the fixture arithmetic + the DAYCARE_ORG_DIM /
ORG_NAME_CASES / SECTOR_SITUATIONS literal tables (q108 discipline).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

from ..pipelines import daycare as DC
from ..pipelines.clinics import sha256_hash_fn
from ._scalar import scalarized_sql, stringify_arrays
from .queries import QueryDef


def q144_daycare_branches(spark, sf_dir):
    """day_care branches: filters + fixes + broadcast org matcher + branch
    payload (reference day_care/__init__.py:10-65, update_branch.py:29-66,
    match_organizations.py:40-98)."""
    return DC.daycare_branches(DC.daycare_clean(spark, sf_dir), sha256_hash_fn)


def q145_daycare_orgs(spark, sf_dir):
    """day_care organizations: kind classification + matched-id override
    (reference update_organization.py:8-27)."""
    return DC.daycare_orgs(DC.daycare_clean(spark, sf_dir))


def q146_childcare_services(spark, sf_dir):
    """child_care services: sector map + last-5-chars id (reference
    child_care/update_service.py:9-53)."""
    return stringify_arrays(DC.childcare_services(spark, sf_dir, sha256_hash_fn))


def q147_kz_orgs(spark, sf_dir):
    """kolzchut_orgs: sorted-distinct org numbers stamped with a fixed tag
    date (reference kolzchut_orgs/__init__.py:19-40)."""
    return DC.kz_orgs(spark, sf_dir)


# organization_id by matcher case index m (see DC.ORG_NAME_CASES)
_MATCH_BY_CASE = [
    "rec-hf", "rec-hf", "rec-gl", "rec-by", "rec-gl", "rec-by",
    None, "rec-emek", "rec-ks", "rec-tv", None, None,
]
# post-replace_council_name org names by case index
_NAME_BY_CASE = [
    "עיריית חיפה", "עירית חיפה", "מועצה אזורית גליל-עליון",
    "מועצה מקומית באר יעקב", "מועצה אזורית גליל-עליון",
    "מועצה מקומית באר יעקב", "מועצה אזורית אין-כזה", "מועצה אזורית עמק",
    "מועצה מקומית כפר-סבא", "עיריית תל-אביב", "חברה בעמ", "",
]

_DAYCARE_CTE = f"""
raw AS (
  SELECT c_custkey AS k, (c_custkey // 3) % 12 AS m FROM customer
  WHERE c_custkey % 3 IN (0, 1) AND c_custkey % 11 != 5
),
cooked AS (
  SELECT k, m,
    '0' || '2612' || lpad(CAST(k % 10000 AS VARCHAR), 4, '0') AS phone,
    CASE WHEN k % 7 = 0
         THEN '512' || lpad(CAST(k % 10000 AS VARCHAR), 4, '0') || '99'
         ELSE '512' || lpad(CAST(k % 10000 AS VARCHAR), 4, '0') END AS org_number_raw,
    CASE m {" ".join(f"WHEN {i} THEN '{n}'" for i, n in enumerate(_NAME_BY_CASE))} END AS org_name,
    CASE m {" ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(_MATCH_BY_CASE) if v)} END AS organization_id,
    CAST(k % 997 AS VARCHAR) AS symbol,
    'מעון ' || CAST(k AS VARCHAR) AS name,
    'עיר ' || CAST(k % 20 AS VARCHAR) AS city,
    CASE WHEN k % 5 != 0 THEN 'רחוב ' || CAST(k % 30 AS VARCHAR) END AS street,
    k % 10 AS house_num,
    CASE WHEN k % 6 != 0 THEN 'מנהל ' || CAST(k % 40 AS VARCHAR) END AS manager,
    CASE WHEN k % 3 = 0 THEN 'משפחתון' ELSE 'צהרון' END AS kind_desc
  FROM raw
),
matched AS (
  SELECT *, coalesce(organization_id, org_number_raw) AS org_number
  FROM cooked
)
"""


def _q144_sql() -> str:
    return f"""
WITH {_DAYCARE_CTE}
SELECT 'mol_daycare-' || substring(sha256(symbol || org_number), 1, 8) AS id,
       'mol_daycare' AS source,
       name,
       concat_ws(' ', city, street,
                 CASE WHEN house_num != 0 THEN CAST(house_num AS VARCHAR) END) AS address,
       concat_ws(' ', city, street,
                 CASE WHEN house_num != 0 THEN CAST(house_num AS VARCHAR) END) AS location,
       phone AS phone_numbers,
       coalesce(manager, '') || ' ' || chr(10) || ' ' || symbol AS description,
       'ACTIVE' AS status,
       CASE WHEN kind_desc = 'משפחתון' THEN 'mol_daycare-1'
            ELSE 'mol_daycare-2' END AS service_id_matcher,
       organization_id
FROM matched
"""


def _q145_sql() -> str:
    return f"""
WITH {_DAYCARE_CTE}
SELECT org_number AS id,
       org_name AS name,
       'mol_daycare' AS source,
       'ACTIVE' AS status,
       CASE WHEN regexp_matches(org_name, 'מועצה מקומית|מועצה אזורית')
            THEN 'רשות מקומית' ELSE 'חברה פרטית' END AS kind
FROM matched
WHERE length(org_number) >= 5
"""


def _q146_sql() -> str:
    sit_whens = " ".join(
        "WHEN '{}' THEN {}".format(s, "[" + ", ".join(f"'{t}'" for t in tags) + "]")
        for s, tags in DC.SECTOR_SITUATIONS.items()
    )
    sector_case = "CASE p_partkey % 5 " + " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(DC.SECTORS)
    ) + " END"
    return f"""
WITH base AS (
  SELECT p_partkey AS k, {sector_case} AS sector,
         'מעון ' || CAST(p_partkey % 50 AS VARCHAR) || ' (' ||
           CAST(10000 + p_partkey AS VARCHAR) || ')' AS full_name
  FROM part
)
SELECT 'meonot-' || substring(sha256(right(full_name, 5)), 1, 8) AS id,
       'meonot' AS source,
       '{DC.CHILDCARE_NAME}' AS name,
       CASE WHEN sector = 'יהודי' THEN ''
            ELSE '{DC.CHILDCARE_DETAILS_PREFIX}' || sector END AS details,
       CASE sector {sit_whens} END AS situations,
       ['human_services:care:daytime_care'] AS responses,
       'yes' AS payment_required,
       'ACTIVE' AS status
FROM base
"""


_Q147_SQL = """
SELECT DISTINCT CAST(500000000 + s_suppkey % 150 AS VARCHAR) AS id,
       '2026-01-01' AS last_tag_date
FROM supplier
"""


def q148_mp4_keyframes(spark, sf_dir):
    """REAL MP4 keyframe index (operators/multimodal.py:mp4_keyframe_index):
    synthesize a valid single-track MP4 per distinct (n_samples, sync_every,
    sample_size) combo — ftyp + full moov box tree (stsd/stts/stss/stsc/
    stsz/stco) + mdat — then sample up to 4 keyframes through
    sample_video_frames, which parses the sync-sample table for true byte
    offsets and decode timestamps. The oracle states every offset in closed
    form (MP4_HEADER_BASE + 4·n_sync + (s-1)·size), so a hash match proves
    the parser reads real box structure, not arithmetic."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from ..operators.multimodal import make_mp4, sample_video_frames  # noqa: PLC0415

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            (F.col("doc_id") % 20 + 4).cast("int").alias("n_samples"),
            (F.col("doc_id") % 3 + 2).cast("int").alias("sync_every"),
            ((F.col("doc_id") % 5 + 1) * 16).cast("int").alias("sample_size"),
        )
        .distinct()
    )

    @F.pandas_udf("binary")
    def encode_mp4(n: pd.Series, g: pd.Series, size: pd.Series) -> pd.Series:
        return pd.Series([make_mp4(int(a), int(b), int(c)) for a, b, c in zip(n, g, size)])

    media = d.withColumn("media", encode_mp4("n_samples", "sync_every", "sample_size"))
    media = media.withColumn("media_content_id", F.sha1("media"))
    frames = sample_video_frames(media, "media", n_frames=4)
    # distinct combos → distinct payloads → unique content ids; the join
    # back is broadcast-dimension sized
    out = frames.join(
        F.broadcast(media.select("media_content_id", "n_samples", "sync_every", "sample_size")),
        "media_content_id",
    )
    return out.select(
        "n_samples",
        "sync_every",
        "sample_size",
        "frame_index",
        "sample_number",
        "byte_offset",
        F.round("timestamp_s", 9).alias("timestamp_s"),
        "is_keyframe",
    )


def _q148_sql() -> str:
    from ..operators.multimodal import MP4_HEADER_BASE  # noqa: PLC0415

    return f"""
WITH combos AS (
  SELECT DISTINCT CAST(doc_id % 20 + 4 AS INT) AS n_samples,
         CAST(doc_id % 3 + 2 AS INT) AS sync_every,
         CAST((doc_id % 5 + 1) * 16 AS INT) AS sample_size
  FROM documents
),
k AS (
  SELECT *, ((n_samples - 1) // sync_every) + 1 AS n_sync,
         least(4, ((n_samples - 1) // sync_every) + 1) AS take
  FROM combos
),
expanded AS (
  SELECT k.*, CAST(t.i AS INT) AS frame_index,
         1 + ((t.i * n_sync) // take) * sync_every AS s
  FROM k, unnest(range(k.take)) AS t(i)
)
SELECT n_samples, sync_every, sample_size, frame_index,
       CAST(s AS INT) AS sample_number,
       CAST({MP4_HEADER_BASE} + 4 * n_sync + (s - 1) * sample_size AS BIGINT) AS byte_offset,
       round(CAST((s - 1) * 20 AS DOUBLE) / 600, 9) AS timestamp_s,
       TRUE AS is_keyframe
FROM expanded
"""

EXT18_REGISTRY = {
    "q144_daycare_branches": QueryDef(
        q144_daycare_branches,
        _q144_sql(),
        "day_care branches (filters, org matcher, hash id, address assembly)",
    ),
    "q145_daycare_orgs": QueryDef(
        q145_daycare_orgs,
        _q145_sql(),
        "day_care organizations (kind classify, matched-id override)",
    ),
    "q146_childcare_services": QueryDef(
        q146_childcare_services,
        scalarized_sql(_q146_sql(), ["situations", "responses"]),
        "child_care services (sector map, last-5 hash id)",
    ),
    "q147_kz_orgs": QueryDef(
        q147_kz_orgs,
        _Q147_SQL,
        "kolzchut orgs (sorted-distinct numbers + tag date)",
    ),
    "q148_mp4_keyframes": QueryDef(
        q148_mp4_keyframes,
        _q148_sql(),
        "real MP4 sync-sample keyframe index (stss/stsz/stco/stts parse)",
    ),
}
