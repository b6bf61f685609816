"""Tests for source connectors (S3-S13) and sink protocol builders
(K1/K2/K4/K5) — transports injected, no network."""

import json
import os

import pytest
from pyspark.sql import functions as F

from srm_etl_spark.sinks.files import write_datapackage
from srm_etl_spark.sinks.jdbc import index_ddl
from srm_etl_spark.sinks.rest import ckan_dataset_payload, es_bulk_lines, upsert_payloads
from srm_etl_spark.sources.connectors import (
    dedup_headers,
    flatten_taxonomy,
    html_table_to_df,
    json_records,
    json_to_df,
    keyset_paged_to_df,
    linked_pager_to_df,
    paged_to_df,
    spreadsheet_to_df,
    taxonomy_to_df,
)


def test_json_records_envelopes():
    assert json_records([{"a": 1}]) == [{"a": 1}]
    assert json_records({"records": [{"a": 1}]}) == [{"a": 1}]
    assert json_records({"result": {"records": [{"a": 1}]}}) == [{"a": 1}]
    assert json_records({"items": [{"a": 1}], "total": 1}) == [{"a": 1}]
    assert json_records({"a": 1}) == [{"a": 1}]
    assert json_records(None) == []


def test_json_to_df(spark):
    df = json_to_df(spark, {"data": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]})
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_paged_to_df_with_flaky_page(spark):
    rows = [{"n": i} for i in range(250)]
    fails = {"left": 2}

    def fetch(skip, limit):
        if skip == 100 and fails["left"] > 0:
            fails["left"] -= 1
            raise ConnectionError("transient")
        return rows[skip : skip + limit]

    df = paged_to_df(spark, fetch, page_size=100, schema="n long")
    assert df.count() == 250
    assert [r.n for r in df.orderBy("n").limit(3).collect()] == [0, 1, 2]


def test_paged_to_df_gives_up():
    def fetch(skip, limit):
        raise ConnectionError("down")

    with pytest.raises(RuntimeError, match="failed after"):
        paged_to_df(None, fetch, page_size=10, retries=2)


def test_keyset_pager_and_invariants(spark):
    data = [{"k": i, "v": i * 10} for i in range(1, 26)]

    def fetch_after(cursor):
        lo = 0 if cursor is None else cursor
        return [r for r in data if r["k"] > lo][:10]

    df = keyset_paged_to_df(spark, fetch_after, key_of=lambda r: r["k"], schema="k long, v long")
    assert df.count() == 25

    def bad_fetch(cursor):
        return [{"k": 1}]  # repeats forever

    with pytest.raises(AssertionError, match="monotonic|duplicate"):
        keyset_paged_to_df(spark, bad_fetch, key_of=lambda r: r["k"], schema="k long")


def test_linked_pager(spark):
    pages = {
        "p1": {"records": [{"a": 1}], "next": "p2"},
        "p2": {"records": [{"a": 2}], "next": "p3"},
        "p3": {"records": [], "next": None},
    }
    df = linked_pager_to_df(spark, lambda u: pages[u], "p1", schema="a long")
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_dedup_headers():
    assert dedup_headers(["a", "a", "b", "a"]) == ["a", "a_2", "b", "a_3"]


def test_spreadsheet_csv(spark, tmp_path):
    p = tmp_path / "sheet.csv"
    p.write_text("skip me\nid,name,name\n1,x,y\n2,z,w\n")
    df = spreadsheet_to_df(spark, str(p), headers_row=2)
    assert df.columns == ["id", "name", "name_2"]
    assert df.count() == 2


def test_html_table(spark):
    html = """<html><body><table>
    <tr><th>city</th><th>count</th></tr>
    <tr><td>תל אביב</td><td>5</td></tr>
    <tr><td>חיפה</td><td>3</td></tr>
    </table></body></html>"""
    df = html_table_to_df(spark, html)
    assert df.count() == 2 and df.columns == ["city", "count"]


def test_taxonomy_flatten(spark):
    tree = [
        {
            "slug": "human_services",
            "name": "שירותים",
            "items": [
                {"slug": "health", "name": "בריאות", "synonyms": ["רפואה"]},
                {"slug": "care", "name": "טיפול", "items": [{"slug": "home", "name": "בית"}]},
            ],
        }
    ]
    rows = flatten_taxonomy(tree)
    ids = [r["id"] for r in rows]
    assert ids == [
        "human_services",
        "human_services:health",
        "human_services:care",
        "human_services:care:home",
    ]
    assert rows[3]["breadcrumbs"] == "שירותים / טיפול"
    df = taxonomy_to_df(spark, tree)
    assert df.count() == 4


def test_index_ddl():
    ddl = index_ddl("cards", ["card_id", "branch_city"])
    assert ddl == [
        'CREATE INDEX IF NOT EXISTS "idx_cards_card_id" ON "cards" ("card_id")',
        'CREATE INDEX IF NOT EXISTS "idx_cards_branch_city" ON "cards" ("branch_city")',
    ]


def test_upsert_payloads_batching(spark):
    df = spark.createDataFrame(
        [(f"k{i}", f"v{i}", "rec%d" % i if i < 12 else None) for i in range(30)],
        "id string, val string, _record_id string",
    )
    payloads = list(upsert_payloads(df, batch_size=10))
    methods = [p["method"] for p in payloads]
    assert set(methods) == {"PATCH", "POST"}
    for p in payloads:
        assert len(p["records"]) <= 10
        assert p["typecast"] is True
    n_updates = sum(len(p["records"]) for p in payloads if p["method"] == "PATCH")
    n_creates = sum(len(p["records"]) for p in payloads if p["method"] == "POST")
    assert (n_updates, n_creates) == (12, 18)
    patch = next(p for p in payloads if p["method"] == "PATCH")
    assert set(patch["records"][0].keys()) == {"id", "fields"}
    assert set(patch["records"][0]["fields"].keys()) == {"val"}


def test_ckan_payload(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    body = ckan_dataset_payload(df, "cards")
    assert body["resources"][0]["schema"]["fields"] == [
        {"id": "id", "type": "bigint"},
        {"id": "name", "type": "string"},
    ]


def test_es_bulk_lines(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    line = es_bulk_lines(df, "cards", "id").collect()[0].bulk
    action, source = line.split("\n")
    assert json.loads(action) == {"index": {"_index": "cards", "_id": 1}}
    assert json.loads(source) == {"id": 1, "name": "x"}


def test_write_datapackage(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string")
    manifest = write_datapackage(df.coalesce(1), str(tmp_path), "stage", fmt="csv")
    with open(os.path.join(tmp_path, "datapackage.json")) as fh:
        on_disk = json.load(fh)
    assert on_disk == manifest
    back = spark.read.option("header", "true").csv(str(tmp_path / "stage"))
    assert back.count() == 2


def test_load_datapackage_roundtrip(spark, tmp_path):
    from srm_etl_spark.sinks.files import write_datapackage
    from srm_etl_spark.sources.tables import load_datapackage

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "id long, name string, score double"
    )
    write_datapackage(df.coalesce(1), str(tmp_path), "things", fmt="csv")
    back = load_datapackage(spark, str(tmp_path))
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())
