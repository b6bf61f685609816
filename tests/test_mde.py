"""Operator-level invariants for the manual-data-entry + curation-import
flows (pipelines/mde.py; hash-parity lives in q134/q135)."""

from pyspark.sql import functions as F

from srm_etl_spark.pipelines import mde as MDE

SF = "/root/testdata/sf0.001"


def _mde(spark):
    return MDE.external_mde(
        MDE.mde_sheets(spark, SF), MDE.mde_sheet_rows(spark, SF), MDE.mde_categories(spark)
    )


def test_mde_row_ids_enumerate_before_org_id_drop(spark):
    # Reference external.py enumerates with `enumerate` BEFORE the falsy
    # Org Id `continue`, so a dropped row still consumes its per-sheet index:
    # surviving indices are unique and start at 0, but have gaps exactly
    # where operator rows with empty org ids were dropped.
    rows = _mde(spark).collect()
    by_sheet = {}
    for r in rows:
        url, i = r["_row_id"].rsplit("#", 1)
        by_sheet.setdefault(url, []).append(int(i))
    saw_gap = False
    for url, idxs in by_sheet.items():
        s = sorted(idxs)
        assert len(s) == len(set(s)), (url, "indices must be unique")
        # a sheet whose leading rows were dropped starts above 0; a sheet
        # with interior drops has holes — both are the reference's behavior
        if s != list(range(len(s))):
            saw_gap = True
    # the fixture drops k%9==3 & k%3==0 operator rows, so gaps must exist
    assert saw_gap, "fixture contains dropped rows; their indices must be consumed"


def test_mde_org_cascade_rules(spark):
    rows = _mde(spark).collect()
    assert rows
    ops = [r for r in rows if r["org_name"].startswith("מפעיל")]
    defaults = [r for r in rows if r["org_name"].startswith("ארגון ברירת מחדל")]
    assert ops and defaults
    for r in ops:
        assert r["org_short_name"] is None  # operator rows never inherit short name
        assert r["org_id"] is None or r["org_id"].startswith("5800")
    for r in defaults:
        assert r["org_id"].startswith("58000000")
    # private-initiative ids nulled, never emitted verbatim
    assert all(r["org_id"] != MDE.PRIVATE_ORG for r in rows)


def test_mde_emergency_note_append(spark):
    rows = _mde(spark).collect()
    flagged = [r for r in rows if MDE.EMERGENCY_MSG in (r["notes"] or "")]
    assert flagged
    for r in rows:
        assert r["notes"] is not None  # reference strips to '' at minimum


def test_curation_two_level_remap(spark):
    out = MDE.run_curation_import(spark, SF)
    br = out["branches"].collect()
    for r in br:
        assert r["organization"] and all(x.startswith("rec-c-org-") for x in r["organization"])
        assert len(r["location"]) == 1
    sv = out["services"].collect()
    assert sv
    for r in sv:
        assert (r["organizations"] or r["branches"])
        for x in r["organizations"]:
            assert x.startswith("rec-c-org-")
        for x in r["branches"]:
            assert x.startswith("rec-c-br-")
