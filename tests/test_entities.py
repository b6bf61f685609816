"""Operator-level invariants for the entities ingestion vertical
(pipelines/entities.py — SURVEY §3.2; hash-parity lives in q126-q130)."""

import pytest
from pyspark.sql import functions as F

from srm_etl_spark.pipelines import entities as ENT

SF = "/root/testdata/sf0.001"


def _enriched(spark):
    return ENT.enrich_orgs(
        ENT.org_registry(spark, SF),
        ENT.guidestar_org_details(spark, SF),
        ENT.budgetkey_entities(spark, SF),
    )


def test_enrich_covers_all_paths(spark):
    # sf0.01: 100 suppliers — every residue class (srm=%11, bk/unknown=%13,
    # guidestar=rest) is populated
    e = ENT.enrich_orgs(
        ENT.org_registry(spark, "/root/testdata/sf0.01"),
        ENT.guidestar_org_details(spark, "/root/testdata/sf0.01"),
        ENT.budgetkey_entities(spark, "/root/testdata/sf0.01"),
    )
    counts = {
        r["enrich_path"]: r["n"]
        for r in e.groupBy("enrich_path").agg(F.count("*").alias("n")).collect()
    }
    for path in ("guidestar", "srm", "budgetkey", "unknown"):
        assert counts.get(path, 0) > 0, (path, counts)


def test_enrich_strips_legal_suffixes_and_nulls_description(spark):
    gs = _enriched(spark).filter(F.col("enrich_path") == "guidestar")
    rows = gs.collect()
    assert rows, "fixture must produce guidestar hits"
    for r in rows:
        assert ' (ע"ר)' not in r["name"] and ' (חל"צ)' not in r["name"]
        assert r["description"] is None  # reference :73 explicitly nulls it


def test_unwind_branches_unique_ids_and_national_per_org(spark):
    active = _enriched(spark).filter(F.col("status") == "ACTIVE")
    out = ENT.unwind_branches(
        active, ENT.guidestar_branches(spark, SF), ENT.guidestar_org_details(spark, SF)
    )
    rows = out.collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids)), "branch ids must not collide across the union"
    nat = {r["id"] for r in rows if r["id"].startswith("national:")}
    assert len(nat) == active.count(), "exactly one national row per active org"
    for r in rows:
        if r["id"].startswith("national:"):
            assert r["description"] == ENT.DISCLAIMER
            assert r["address"] == "שירות ארצי"


def test_unwind_branch_address_rules(spark):
    active = _enriched(spark).filter(F.col("status") == "ACTIVE")
    out = ENT.unwind_branches(
        active, ENT.guidestar_branches(spark, SF), ENT.guidestar_org_details(spark, SF)
    ).filter(F.col("id").startswith("guidestar:B"))
    for r in out.collect():
        assert r["address"] is None or " תאי דואר" not in r["address"]
        # alternate 'ללא כתובת' never appended
        assert r["address"] is None or "ללא כתובת" not in r["address"]


def _service_frames(spark):
    enriched = _enriched(spark)
    orgs = ENT.org_registry(spark, SF)
    orgs_all_active = (
        enriched.select("id", "status")
        .unionByName(orgs.filter(F.col("source") != "entities").select("id", "status"))
        .filter(F.col("status") == "ACTIVE")
    )
    return ENT.process_services(
        orgs_all_active,
        ENT.guidestar_services(spark, SF),
        ENT.guidestar_branches(spark, SF),
        ENT.taxonomy_mapping(spark),
    )


def test_process_services_drop_and_branch_rules(spark):
    out, _ = _service_frames(spark)
    rows = out.collect()
    assert rows
    for r in rows:
        assert "נדרש סיוע" not in r["name"]
        assert len(r["branches"]) > 0
        assert r["payment_required"] in ("no", "yes")
        assert list(r["organizations"]) == []
        # national: appended last when present
        nats = [b for b in r["branches"] if b.startswith("national:")]
        assert len(nats) <= 1
        if nats:
            assert r["branches"][-1] == nats[0]


def test_process_services_rejected_tag_gone(spark):
    out, _ = _service_frames(spark)
    # T7 (REJECTED) rides on p_partkey % 10 == 7 -> those service ids are gone
    bad = out.filter(
        F.substring(F.col("id"), 12, 100).try_cast("int") % 10 == 7
    ).count()
    assert bad == 0


def test_map_items_raises_on_unknown_enum(spark):
    df = spark.createDataFrame([("Bogus;Phone",)], "remote string")
    items = F.split(F.col("remote"), ";")
    col = ENT._map_items(items, ENT.REMOTE_TEXT, ENT.REMOTE_SKIP, "remoteDelivery")
    with pytest.raises(Exception, match="unknown remoteDelivery"):
        df.select(col.alias("x")).collect()


def test_run_entities_merge_outcomes(spark):
    staged = ENT.run_entities(spark, SF)
    svc = staged["services"].collect()
    inactive = [r for r in svc if r["status"] == "INACTIVE"]
    assert inactive, "stale staging rows must soft-delete"
    assert all(r["_changed"] for r in svc), "only_changed drops unchanged rows"
    br = staged["branches"].collect()
    # unchanged fetched rows (last digit 0-3, not perturbed) were skipped
    assert all(r["_changed"] for r in br)
    skipped = {r["id"][-1] for r in br}
    assert "0" in {c for c in "0123456789"} - skipped or len(skipped) < 10


def test_incremental_refresh_equals_full_unwind(spark):
    from pyspark.sql import functions as F

    full = ENT.unwind_branches(
        _enriched(spark).filter(F.col("status") == "ACTIVE"),
        ENT.guidestar_branches(spark, SF),
        ENT.guidestar_org_details(spark, SF),
    )
    inc = ENT.incremental_unwind_refresh(spark, SF)
    a = sorted(map(str, full.collect()))
    b = sorted(map(str, inc.collect()))
    assert a == b
