"""Operator-level invariants for the meser vertical (pipelines/meser.py —
SURVEY §3.3; hash-parity lives in q131-q133)."""

from pyspark.sql import functions as F

from srm_etl_spark.pipelines import meser as MES

SF = "/root/testdata/sf0.001"


def _transformed(spark):
    return MES.transform_meser(
        MES.sanitize_meser(MES.meser_raw(spark, SF)), MES.meser_tag_mapping(spark)
    )


def test_tag_merge_preserves_first_occurrence_order(spark):
    # hand-built case: two rows in one group; the merged list must follow
    # (feed order, field order) with duplicates dropped at first occurrence
    rows = [
        (1, ["a", "b", "c"]),
        (2, ["b", "d", "a"]),
    ]
    df = spark.createDataFrame(rows, "_feed long, tags array<string>")
    ex = df.select(
        F.lit(0).alias("_gid"), "_feed", F.posexplode("tags").alias("_tpos", "tag")
    ).withColumn("_k", F.struct("_feed", "_tpos"))
    out = MES._first_occurrence_merge(ex, "_gid", "tag", "_k", "merged").collect()
    assert list(out[0]["merged"]) == ["a", "b", "c", "d"]


def test_phone_normalization_and_org_fallback(spark):
    t = _transformed(spark)
    rows = t.collect()
    for r in rows:
        p = r["phone_numbers"]
        assert p == "" or p.startswith("0")
        assert 5 <= len(r["organization_id"]) <= 15
    assert any(r["organization_id"] == MES.FALLBACK_ORG for r in rows)


def test_group_dedup_merges_tags(spark):
    t = _transformed(spark)
    # groups driven by k//2 merge two raw rows -> tagging longer than any
    # single row's 5 fields would not happen, but merged distinct lists do
    merged = t.filter(F.size("tagging") > 5).count()
    assert merged > 0, "some groups must merge tag lists from 2 rows"


def test_soft_delete_sweep_emits_only_changes(spark):
    staged = MES.run_meser(spark, SF)
    # only_changed discipline: every emitted row is a real write, and stale
    # staging rows flip INACTIVE (at sf0.001 the org + service merges have
    # stale rows; the branch fetch happens to cover its whole current table)
    inactive_total = 0
    for name in ("organizations", "branches", "services"):
        rows = staged[name].collect()
        assert all(r["_changed"] for r in rows), name
        inactive_total += sum(r["status"] == "INACTIVE" for r in rows)
    assert inactive_total > 0, "stale staging rows must soft-delete"


def test_service_links_union_existing(spark):
    staged = MES.run_meser(spark, SF)
    svc = staged["services"].filter(F.col("status") == "ACTIVE").collect()
    with_old = [
        r for r in svc if any(b.startswith("rec-meser-b-old") for b in (r["branches"] or []))
    ]
    assert with_old, "existing staging links must survive the FK union"
    for r in with_old:
        assert any(not b.startswith("rec-meser-b-old") for b in r["branches"]), (
            "new branch link must be added alongside the existing one"
        )
