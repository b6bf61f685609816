"""Auto-tagging truth table — ports the reference's executable asserts
(operators/derive/autotagging.py:55-73) byte-for-byte."""

from pyspark.sql import functions as F

from srm_etl_spark.pipelines.autotagging import apply_auto_tagging

CANCER = "human_situations:health:neoplasm:cancer"


def _rules(spark):
    return spark.createDataFrame(
        [(0, "סרטן", ["organization_name", "organization_purpose", "service_name"], [CANCER], [])],
        "rule_idx int, query string, fields array<string>, "
        "situation_ids array<string>, response_ids array<string>",
    )


def _rows(spark):
    rows = [
        ("k1", "1", "2", "3"),
        ("k2", "האגודה למלחמה בסרטן", "2", "3"),  # suffix match
        ("k3", "טיפול סרטןי", "2", "3"),  # strict prefix of longer word: no
        ("k4", "סרטן ריאות", "2", "3"),  # word-boundary containment
        ("k5", "1", "2", "רק סרטן!"),  # punctuation breaks both rules: no
    ]
    return spark.createDataFrame(
        rows, "card_key string, organization_name string, organization_purpose string, service_name string"
    ).select(
        "*",
        F.array(F.lit("4")).alias("situation_ids"),
        F.array(F.lit("5")).alias("response_ids"),
    )


def test_reference_truth_table(spark):
    out = apply_auto_tagging(_rows(spark), _rules(spark)).orderBy("card_key")
    got = [(r["situation_ids"], r["response_ids"]) for r in out.collect()]
    assert got == [
        (["4"], ["5"]),
        (["4", CANCER], ["5"]),
        (["4"], ["5"]),
        (["4", CANCER], ["5"]),
        (["4"], ["5"]),
    ]


def test_auto_tagged_audit_and_rule_order(spark):
    rules = spark.createDataFrame(
        [
            (1, "בסרטן", ["organization_name"], ["s-late"], ["r-late"]),
            (0, "סרטן", ["organization_name"], ["4"], []),  # tag already present
        ],
        "rule_idx int, query string, fields array<string>, "
        "situation_ids array<string>, response_ids array<string>",
    )
    out = apply_auto_tagging(_rows(spark), rules).filter(F.col("card_key") == "k2").first()
    # situation '4' was already on the row: not re-added, but audited; rule
    # order (idx 0 before idx 1) is preserved in the audit trail
    assert out["situation_ids"] == ["4", "s-late"]
    assert out["response_ids"] == ["5", "r-late"]
    assert out["auto_tagged"] == ["4", "s-late", "r-late"]


def test_unmatched_rows_get_empty_audit(spark):
    out = apply_auto_tagging(_rows(spark), _rules(spark)).filter(
        F.col("card_key") == "k1"
    ).first()
    assert out["auto_tagged"] == []


def test_autotagging_in_derive_dag(spark):
    """card_data accepts an autotag rules table and injects tags between
    parent expansion and the string join (reference card_data_flow order)."""
    from srm_etl_spark.pipelines.derive import card_data, flat_branches, flat_services, flat_table
    from srm_etl_spark.pipelines import staging_fixtures as FIX

    sf = "/root/testdata/sf0.001"
    fb = flat_branches(FIX.branches(spark, sf), FIX.locations(spark, sf), FIX.organizations(spark, sf))
    ft = flat_table(flat_services(FIX.services(spark, sf), fb), fb)
    plain = card_data(ft)
    one_name = plain.select("service_name").first()[0]
    rules = spark.createDataFrame(
        [(0, one_name, ["service_name"], ["human_situations:test:tag"], [])],
        "rule_idx int, query string, fields array<string>, "
        "situation_ids array<string>, response_ids array<string>",
    )
    tagged = card_data(ft, autotag_rules=rules)
    assert plain.count() == tagged.count()
    assert sorted(plain.columns) == sorted(tagged.columns)
    hit = tagged.filter(F.col("situation_ids").contains("human_situations:test:tag"))
    assert hit.count() >= 1
