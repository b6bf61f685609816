"""Round-11 extension: the cross-entry-point ETL composition.

q165 — the LAST uncomposed seam (round-10 verdict #1): the reference's
       verticals run as separate entry points glued together implicitly by
       the shared Airtable staging base (``configuration.json:130-169``) —
       the ``airtable_updater`` ingestion merges WRITE
       Organizations/Branches/Services, the derive DAG later READS them and
       fans out to the publish sinks. q129/q133 certify the merges, q158 the
       derive chain, q159/q161 the publish fan-out — each as its own lineage.
       q165 certifies the HANDOFFS: ingestion upserts → post-merge staging
       tables → the UNMODIFIED derive DAG over that post-upsert state →
       publish surfaces, one phase-labeled hash-gated result. The current
       tables are perturbed so every merge path is load-bearing downstream:
       current-only branches under ``manage_status=False`` must SURVIVE into
       cards, soft-deleted services under ``manage_status=True`` must vanish
       from them, and updates/inserts must flow through with the fetched
       values.

       The oracle reuses the derive chain's EXACT CTE text
       (queries._CHAIN_*_T) rebound onto post-merge CTEs — the engine and
       the oracle share one chain definition, so a hash match certifies that
       derive consumed precisely the state the upserts produced.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import (
    _CHAIN_CARDS_T,
    _CHAIN_FB_T,
    _CHAIN_ORGS_T,
    _FIX_BRS_T,
    _FIX_LOCS_CTE,
    _FIX_ORGS_T,
    _FIX_SVCS_T,
    QueryDef,
)
from .queries_ext21 import _s

EXT24_REGISTRY: dict[str, QueryDef] = {}


_ORG_SIG = ["name", "short_name", "kind", "phone", "description", "source", "status"]
_BR_SIG = [
    "organization", "location", "name", "address", "operating_unit",
    "location_accurate", "last_modified", "source", "status",
]


def _svc_sig():
    return F.concat_ws(
        "|",
        _s("name"), _s("organization"),
        F.coalesce(F.array_join("responses", ","), F.lit("")),
        F.coalesce(F.array_join("situations", ","), F.lit("")),
        _s("description"),
        F.format_string("%.2f", F.coalesce(F.col("boost"), F.lit(0.0))),
        _s("last_modified"), _s("source"), _s("status"),
    )


def q165_etl_end_to_end(spark, sf_dir):
    """§3 composed end-to-end (pipelines/etl_composed.py): the three
    airtable_updater merges' write sets (10-12), the post-merge staging
    tables (20-22), the derive cards built FROM those post tables (30), and
    two publish surfaces consuming the same state — ES bulk lines (40,
    byte-exact like q159) and the organizations count surface (50, q161's
    leg over the post-upsert org dim). Scale shape: three key-partitioned
    upsert joins, persisted post tables feeding both certification and
    derive, run_derive's persist discipline on fb/ft/cards; the publish legs
    are maps + one |orgs|-bounded aggregate over the persisted cards."""
    from ..pipelines.etl_composed import run_full_etl  # noqa: PLC0415
    from ..sinks.es import to_es_actions  # noqa: PLC0415

    st = run_full_etl(spark, sf_dir)

    def leg(df, phase, key_prefix, sig):
        return df.select(
            F.lit(phase).alias("phase"),
            F.concat(F.lit(key_prefix), F.col("id")).alias("key"),
            sig.alias("sig"),
        )

    org_sig = F.concat_ws("|", *[_s(c) for c in _ORG_SIG])
    br_sig = F.concat_ws("|", *[_s(c) for c in _BR_SIG])
    legs = [
        leg(st["writes_orgs"], "10_write_orgs", "o:", org_sig),
        leg(st["writes_branches"], "11_write_branches", "b:", br_sig),
        leg(st["writes_services"], "12_write_services", "s:", _svc_sig()),
        leg(st["post_orgs"], "20_staging_orgs", "o:", org_sig),
        leg(st["post_branches"], "21_staging_branches", "b:", br_sig),
        leg(st["post_services"], "22_staging_services", "s:", _svc_sig()),
        st["cards"].select(
            F.lit("30_cards").alias("phase"),
            F.concat(F.lit("card:"), F.col("card_key")).alias("key"),
            F.concat_ws(
                "|", _s("service_id"), _s("service_name"), _s("branch_id"),
                _s("branch_name"), _s("branch_city"), _s("organization"),
                _s("organization_name"), _s("organization_branch_count"),
                _s("national_service"), _s("response_ids"), _s("situation_ids"),
            ).alias("sig"),
        ),
    ]
    # publish leg 1: the ES bulk wire lines from the post-upsert card surface
    # (q159's shape; organization_kind joined back from flat_branches)
    kind = st["flat_branches"].select("branch_id", "organization_kind")
    surface = st["cards"].join(F.broadcast(kind), "branch_id").select(
        "card_key", "service_id", "service_name", "branch_id",
        "branch_city", "organization", "organization_kind",
        "organization_name", "national_service",
    )
    legs.append(
        to_es_actions(surface, "cards", "card_key", revision="r11").select(
            F.lit("40_es").alias("phase"),
            F.col("action_json").alias("key"),
            F.col("doc_json").alias("sig"),
        )
    )
    # publish leg 2: the organizations count surface over the SAME post state
    from ..pipelines.es_publish import organizations_surface  # noqa: PLC0415

    orgs_dim = st["post_orgs"].select("id", "name", "description", "kind")
    legs.append(
        organizations_surface(st["cards"], orgs_dim).select(
            F.lit("50_orgs_surface").alias("phase"),
            F.concat(F.lit("os:"), F.col("id")).alias("key"),
            F.concat_ws(
                "|", _s("name"), _s("description"), _s("kind"),
                _s("count"), _s(F.col("count") * 10),
            ).alias("sig"),
        )
    )
    out = legs[0]
    for lg in legs[1:]:
        out = out.unionByName(lg)
    return out


def _differs(fields: list[str]) -> str:
    return " OR ".join(f"f.{x} IS DISTINCT FROM c.{x}" for x in fields)


_ORG_FIELDS_SQL = ["name", "short_name", "kind", "phone", "description"]
_BR_FIELDS_SQL = [
    "organization", "location", "name", "address", "operating_unit",
    "location_accurate", "last_modified",
]
_SVC_FIELDS_SQL = [
    "name", "organization", "response0", "response1", "situation0",
    "situation1", "description", "boost", "last_modified",
]

_Q165_MERGE_CTES = f"""
orgs_cur AS (
  SELECT id,
         CASE WHEN right(id, 1) IN ('4','5') THEN 'ישן ' || name ELSE name END AS name,
         short_name, kind, phone, description, 'entities' AS source, status
  FROM orgs_fx WHERE right(id, 1) != '8'
  UNION ALL
  SELECT 'org-gone-' || CAST(n_nationkey AS VARCHAR), 'ארגון ותיק ' || n_name,
         NULL, 'company', NULL, NULL, 'entities', 'ACTIVE'
  FROM nation
), orgs_post AS (
  SELECT f.id, f.name, f.short_name, f.kind, f.phone, f.description,
         'entities' AS source, 'ACTIVE' AS status,
         (c.id IS NULL OR {_differs(_ORG_FIELDS_SQL)}
          OR c.status <> 'ACTIVE') AS changed
  FROM orgs_fx f LEFT JOIN orgs_cur c ON f.id = c.id
  UNION ALL
  SELECT c.id, c.name, c.short_name, c.kind, c.phone, c.description,
         c.source, c.status, FALSE
  FROM orgs_cur c WHERE NOT EXISTS (SELECT 1 FROM orgs_fx f WHERE f.id = c.id)
), brs_cur AS (
  SELECT id, organization, location,
         CASE WHEN right(id, 1) IN ('2','3') THEN 'ישן ' || name ELSE name END AS name,
         address, operating_unit, location_accurate, last_modified,
         'entities' AS source, status
  FROM brs_fx WHERE right(id, 1) != '7'
  UNION ALL
  SELECT 'branch-legacy-' || CAST(n_nationkey AS VARCHAR),
         'org-' || CAST((n_nationkey % (SELECT count(*) FROM supplier)) + 1 AS VARCHAR),
         'loc-' || CAST(n_nationkey AS VARCHAR),
         'סניף ותיק ' || CAST(n_nationkey AS VARCHAR),
         'רחוב ' || CAST(n_nationkey + 1 AS VARCHAR),
         NULL, TRUE, NULL, 'entities', 'ACTIVE'
  FROM nation
), brs_post AS (
  SELECT f.id, f.organization, f.location, f.name, f.address,
         f.operating_unit, f.location_accurate, f.last_modified,
         'entities' AS source, 'ACTIVE' AS status,
         (c.id IS NULL OR {_differs(_BR_FIELDS_SQL)}
          OR c.status <> 'ACTIVE') AS changed
  FROM brs_fx f LEFT JOIN brs_cur c ON f.id = c.id
  UNION ALL
  SELECT c.id, c.organization, c.location, c.name, c.address,
         c.operating_unit, c.location_accurate, c.last_modified,
         c.source, c.status, FALSE
  FROM brs_cur c WHERE NOT EXISTS (SELECT 1 FROM brs_fx f WHERE f.id = c.id)
), svcs_cur AS (
  SELECT id, name, organization, response0, response1, situation0, situation1,
         CASE WHEN right(id, 1) IN ('1','2') THEN 'תיאור ישן' ELSE description END AS description,
         boost, last_modified, 'guidestar' AS source, status
  FROM svcs_fx WHERE right(id, 1) != '9'
  UNION ALL
  SELECT 'svc-gone-' || CAST(p_partkey AS VARCHAR), 'שירות שנעלם', NULL,
         NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'guidestar', 'ACTIVE'
  FROM part WHERE p_partkey % 97 = 0
), svcs_post AS (
  SELECT coalesce(f.id, c.id) AS id,
         CASE WHEN f.id IS NOT NULL THEN f.name ELSE c.name END AS name,
         CASE WHEN f.id IS NOT NULL THEN f.organization ELSE c.organization END AS organization,
         CASE WHEN f.id IS NOT NULL THEN f.response0 ELSE c.response0 END AS response0,
         CASE WHEN f.id IS NOT NULL THEN f.response1 ELSE c.response1 END AS response1,
         CASE WHEN f.id IS NOT NULL THEN f.situation0 ELSE c.situation0 END AS situation0,
         CASE WHEN f.id IS NOT NULL THEN f.situation1 ELSE c.situation1 END AS situation1,
         CASE WHEN f.id IS NOT NULL THEN f.description ELSE c.description END AS description,
         CASE WHEN f.id IS NOT NULL THEN f.boost ELSE c.boost END AS boost,
         CASE WHEN f.id IS NOT NULL THEN f.last_modified ELSE c.last_modified END AS last_modified,
         'guidestar' AS source,
         CASE WHEN f.id IS NOT NULL THEN 'ACTIVE' ELSE 'INACTIVE' END AS status,
         (c.id IS NULL OR f.id IS NULL OR {_differs(_SVC_FIELDS_SQL)}) AS changed
  FROM svcs_fx f FULL OUTER JOIN svcs_cur c ON f.id = c.id
)"""

_ORG_SIG_SQL = (
    "concat_ws('|', coalesce(name, ''), coalesce(short_name, ''), "
    "coalesce(kind, ''), coalesce(phone, ''), coalesce(description, ''), "
    "source, status)"
)
_BR_SIG_SQL = (
    "concat_ws('|', coalesce(organization, ''), coalesce(location, ''), "
    "coalesce(name, ''), coalesce(address, ''), coalesce(operating_unit, ''), "
    "CAST(location_accurate AS VARCHAR), coalesce(last_modified, ''), "
    "source, status)"
)
_SVC_SIG_SQL = (
    "concat_ws('|', coalesce(name, ''), coalesce(organization, ''), "
    "coalesce(response0 || ',' || response1, ''), "
    "coalesce(situation0 || ',' || situation1, ''), "
    "coalesce(description, ''), printf('%.2f', coalesce(boost, 0.0)), "
    "coalesce(last_modified, ''), source, status)"
)

Q165_SQL = (
    "WITH "
    + _FIX_ORGS_T.format(name="orgs_fx") + ", "
    + _FIX_LOCS_CTE + ", "
    + _FIX_BRS_T.format(name="brs_fx") + ", "
    + _FIX_SVCS_T.format(name="svcs_fx") + ", "
    + _Q165_MERGE_CTES.strip() + ",\n"
    # the derive chain's EXACT text, rebound onto the post-merge state
    + _CHAIN_ORGS_T.format(src="orgs_post") + ", "
    + """brs AS (
  SELECT id, organization, location, name, address, operating_unit,
         location_accurate, last_modified, status
  FROM brs_post
), svcs AS (
  SELECT id, name, organization, response0, response1, situation0,
         situation1, description, boost, last_modified, status
  FROM svcs_post
), """
    + _CHAIN_FB_T.format(brs="brs") + ", "
    + _CHAIN_CARDS_T.format(svcs="svcs") + ", "
    + """surface AS (
  SELECT c.card_key, c.service_id, c.service_name, c.branch_id,
         c.branch_city, c.organization, f.organization_kind,
         c.organization_name, c.national_service
  FROM cards c JOIN fb f ON c.branch_id = f.branch_id
), ocounts AS (
  SELECT organization AS id, count(*) AS cnt FROM cards GROUP BY organization
)
"""
    + f"""
SELECT '10_write_orgs' AS phase, 'o:' || id AS key, {_ORG_SIG_SQL} AS sig
FROM orgs_post WHERE changed
UNION ALL
SELECT '11_write_branches', 'b:' || id, {_BR_SIG_SQL} FROM brs_post WHERE changed
UNION ALL
SELECT '12_write_services', 's:' || id, {_SVC_SIG_SQL} FROM svcs_post WHERE changed
UNION ALL
SELECT '20_staging_orgs', 'o:' || id, {_ORG_SIG_SQL} FROM orgs_post
UNION ALL
SELECT '21_staging_branches', 'b:' || id, {_BR_SIG_SQL} FROM brs_post
UNION ALL
SELECT '22_staging_services', 's:' || id, {_SVC_SIG_SQL} FROM svcs_post
UNION ALL
SELECT '30_cards', 'card:' || card_key,
       concat_ws('|', service_id, service_name, branch_id, branch_name,
                 coalesce(branch_city, ''), organization, organization_name,
                 CAST(organization_branch_count AS VARCHAR),
                 CAST(national_service AS VARCHAR), response_ids, situation_ids)
FROM cards
UNION ALL
SELECT '40_es',
       '{{"index":{{"_index":"cards","_id":"' || card_key || '"}}}}',
       '{{"card_key":"' || card_key
         || '","service_id":"' || service_id
         || '","service_name":"' || service_name
         || '","branch_id":"' || branch_id
         || '","branch_city":"' || branch_city
         || '","organization":"' || organization
         || '","organization_kind":"' || organization_kind
         || '","organization_name":"' || organization_name
         || '","national_service":' || CAST(national_service AS VARCHAR)
         || ',"revision":"r11"}}'
FROM surface
UNION ALL
SELECT '50_orgs_surface', 'os:' || oc.id,
       concat_ws('|', coalesce(o.name, ''), coalesce(o.description, ''),
                 coalesce(o.kind, ''), CAST(oc.cnt AS VARCHAR),
                 CAST(oc.cnt * 10 AS VARCHAR))
FROM ocounts oc LEFT JOIN orgs_post o ON oc.id = o.id
"""
)

EXT24_REGISTRY["q165_etl_end_to_end"] = QueryDef(
    q165_etl_end_to_end, Q165_SQL,
    "cross-entry-point ETL composed: ingestion upserts -> post-merge staging "
    "tables -> UNMODIFIED derive DAG over the post state -> ES bulk + org "
    "count publish, one lineage (S1 K3 K6 J3 §2.10 + to_dp.py + to_es.py)",
)


# --------------------------------------------------------------------------
# q166 — the training-corpus pipeline with DSIR at the paper's placement
# --------------------------------------------------------------------------

_DSIR_CORPUS_K = 64


def q166_corpus_with_dsir(spark, sf_dir):
    """q160's composed training-corpus pipeline with the DSIR stage spliced
    in at the paper's intended placement (Xie et al. 2023 §3: after
    dedup/quality/decontamination, before final composition): exact dedup →
    LSH near-dup → quality → decontam → DSIR importance selection toward the
    held-out eval slice (k=64 — strictly selective at every SF) → quota →
    packing. Certifies DSIR over a CURATED corpus (q164 runs it over raw
    docs) and that the downstream quota/packing consume exactly the selected
    subset. Scale shape: the DSIR stage adds one gram shuffle over the
    (already small) clean corpus + a driver-merged top-k broadcast back —
    everything else is q160's audited chain."""
    from ..pipelines.curation import training_corpus_stages  # noqa: PLC0415
    from .queries import _t  # noqa: PLC0415

    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 37 == 0)
    raw = d.filter(F.col("doc_id") % 37 != 0)
    st = training_corpus_stages(raw, ev, dsir_k=_DSIR_CORPUS_K)

    def doc_phase(df, name, *sig_cols):
        return df.select(
            F.lit(name).alias("phase"),
            F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("key"),
            F.concat_ws("|", *[_s(c) for c in sig_cols]).alias("sig"),
        )

    legs = [
        doc_phase(st["exact"], "10_exact", "lang", "source"),
        doc_phase(st["near"], "20_neardup", "lang", "source"),
        doc_phase(st["quality"], "30_quality", "n_tokens"),
        doc_phase(st["clean"], "40_decontam", "lang", "source"),
        st["dsir"].select(
            F.lit("45_dsir").alias("phase"),
            F.concat(F.lit("d:"), F.col("id").cast("string")).alias("key"),
            F.concat_ws(
                "|",
                F.format_string("%.6f", F.col("logw")),
                F.format_string("%.6f", F.col("key")),
            ).alias("sig"),
        ),
        doc_phase(st["kept"], "50_quota", "source", "lang", "rank"),
        st["seqs"].select(
            F.lit("60_packed").alias("phase"),
            F.concat(
                F.lit("p:"), _s("lang"), F.lit(":"), F.col("seq_id").cast("string")
            ).alias("key"),
            F.concat_ws("|", _s("n_docs"), _s("sum_tokens")).alias("sig"),
        ),
    ]
    out = legs[0]
    for lg in legs[1:]:
        out = out.unionByName(lg)
    return out


def _q166_sql() -> str:
    from .queries import _NORM  # noqa: PLC0415
    from .queries_ext22 import _Q160_CTES_TO_CLEAN, _Q160_PHASES, _Q160_TAIL_T  # noqa: PLC0415
    from .queries_ext23 import _DSIR_SCORED_T  # noqa: PLC0415

    dsir = (
        f"""dsrc AS (
  SELECT doc_id, norm FROM clean
), dtgt AS (
  SELECT doc_id, {_NORM.format(c='text')} AS norm FROM documents WHERE doc_id % 37 = 0
), """
        + _DSIR_SCORED_T.replace("__DSRC__", "dsrc").replace("__DTGT__", "dtgt")
        + f""", dsel AS (
  SELECT doc_id, logw, key FROM scored ORDER BY key DESC LIMIT {_DSIR_CORPUS_K}
), selected AS (
  SELECT c.* FROM clean c SEMI JOIN dsel s ON c.doc_id = s.doc_id
)"""
    )
    phases = _Q160_PHASES.rstrip() + """
UNION ALL
SELECT '45_dsir', 'd:' || CAST(doc_id AS VARCHAR),
       printf('%.6f', logw) || '|' || printf('%.6f', key) FROM dsel
"""
    return (
        "WITH " + _Q160_CTES_TO_CLEAN + ", "
        + dsir + ", "
        + _Q160_TAIL_T.replace("__QSRC__", "selected")
        + phases
    )


Q166_SQL = _q166_sql()

EXT24_REGISTRY["q166_corpus_with_dsir"] = QueryDef(
    q166_corpus_with_dsir, Q166_SQL,
    "LLM-pipeline composed with DSIR: dedup -> LSH -> quality -> decontam -> "
    "DSIR importance selection (k=64) -> quota -> packing, one lineage "
    "(arXiv:2302.03169 placement)",
)
