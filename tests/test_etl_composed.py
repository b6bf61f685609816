"""Unit tests for the cross-entry-point ETL composition
(pipelines/etl_composed.py) — the staging-handoff semantics the q165 oracle
hash-gates in bulk, pinned here path by path."""

from pyspark.sql import functions as F

from srm_etl_spark.pipelines.etl_composed import run_full_etl

SF = "/root/testdata/sf0.001"


def _etl(spark):
    return run_full_etl(spark, SF)


def test_manage_status_false_keeps_unfetched_rows(spark):
    st = _etl(spark)
    # legacy branches/orgs are current-only: the patch merge must pass them
    # through untouched (the Airtable base keeps rows the updater never sends)
    legacy_b = st["post_branches"].filter(F.col("id").startswith("branch-legacy-"))
    assert legacy_b.count() == 25  # one per nation
    assert legacy_b.filter(F.col("status") != "ACTIVE").count() == 0
    # and they must NOT be in the write set (nothing changed about them)
    assert (
        st["writes_branches"].filter(F.col("id").startswith("branch-legacy-")).count()
        == 0
    )
    legacy_o = st["post_orgs"].filter(F.col("id").startswith("org-gone-"))
    assert legacy_o.count() == 25


def test_soft_delete_flips_inactive_and_is_written(spark):
    st = _etl(spark)
    gone = st["post_services"].filter(F.col("id").startswith("svc-gone-"))
    assert gone.count() > 0
    assert gone.filter(F.col("status") != "INACTIVE").count() == 0
    # soft deletes are status changes -> always in the write set
    wrote = st["writes_services"].filter(F.col("id").startswith("svc-gone-"))
    assert wrote.count() == gone.count()


def test_update_and_insert_paths_write_fetched_values(spark):
    st = _etl(spark)
    last = F.substring("id", -1, 1)
    # digit-8 orgs were missing from current -> insert path -> written
    inserts = st["writes_orgs"].filter(last == "8")
    assert inserts.count() > 0
    # digit-4/5 orgs had stale 'ישן ' names -> update path -> written with
    # the FETCHED (clean) name
    updates = st["writes_orgs"].filter(last.isin("4", "5"))
    assert updates.count() > 0
    assert updates.filter(F.col("name").startswith("ישן ")).count() == 0
    # unperturbed digits are skipped (write-amplification control)
    assert st["writes_orgs"].filter(last.isin("0", "6")).count() == 0


def test_derive_consumes_post_upsert_state(spark):
    st = _etl(spark)
    cards = st["cards"]
    # surviving legacy branches MUST surface in cards (the handoff is real)
    assert cards.filter(F.col("branch_id").startswith("branch-legacy-")).count() > 0
    # soft-deleted services MUST NOT
    assert cards.filter(F.col("service_id").startswith("svc-gone-")).count() == 0
    # every card's branch exists ACTIVE in the post staging table
    orphan = cards.join(
        st["post_branches"].filter(F.col("status") == "ACTIVE").select(
            F.col("id").alias("branch_id")
        ),
        "branch_id",
        "left_anti",
    )
    assert orphan.count() == 0
