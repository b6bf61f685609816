"""Unit tests for the mapbox derive flows (pipelines/mapbox.py, reference
operators/derive/to_mapbox.py). The composed surface is oracle-gated as q162;
these pin the point_title edge rules the fixture topology can't reach
(lone-inaccurate '*', single-card card_id, mode tie-breaks, truncation
boundary)."""

from pyspark.sql import functions as F

from srm_etl_spark.pipelines.mapbox import geo_data_surface, geo_point_records


def _recs(spark, rows):
    return spark.createDataFrame(
        rows,
        "point_id string, card_key string, lat double, lon double, "
        "bname string, branch_location_accurate boolean, "
        "response_category string, organization string, "
        "response_ids array<string>, situation_ids array<string>",
    )


def test_point_title_rules(spark):
    long_name = "יחידה ארוכה מאוד לשירותי רווחה"  # > 20 chars
    rows = [
        # p1: two distinct names, 'b' twice -> mode 'b'; accurate mixed -> max True
        ("p1", "c1", 1.0, 2.0, "a", False, "x", "o1", ["r:x"], []),
        ("p1", "c2", 1.0, 2.0, "b", True, "x", "o1", ["r:x"], []),
        ("p1", "c3", 1.0, 2.0, "b", True, "y", "o1", ["r:y"], []),
        # p2: lone INACCURATE single-card point -> '*' suffix + card_id
        ("p2", "c4", 3.0, 4.0, "solo", False, "x", "o2", ["r:x"], []),
        # p3: single long name, accurate -> truncated, no suffix; 2 cards -> no card_id
        ("p3", "c5", 5.0, 6.0, long_name, True, "x", "o3", ["r:x"], []),
        ("p3", "c6", 5.0, 6.0, long_name, True, "x", "o3", ["r:x"], []),
        # p4: count TIE between 'm' and 'n' -> first occurrence (min card_key) wins
        ("p4", "c7", 7.0, 8.0, "n", True, "x", "o4", ["r:x"], []),
        ("p4", "c8", 7.0, 8.0, "m", True, "x", "o4", ["r:x"], []),
    ]
    got = {r["point_id"]: r for r in geo_data_surface(_recs(spark, rows)).collect()}

    p1 = got["p1"]
    assert p1["title"] == "b  +1"  # mode + two-space +N (to_mapbox.py:82)
    assert p1["full_title"] == "b  +1"
    assert p1["branch_location_accurate"] is True  # max over mixed
    assert p1["service_count"] == 3 and p1["branch_count"] == 2
    assert p1["card_id"] is None  # multi-card point
    assert p1["response_category"] == "x"  # 2 x vs 1 y

    p2 = got["p2"]
    assert p2["title"] == "solo*"  # lone inaccurate pin (to_mapbox.py:84-86)
    assert p2["card_id"] == "c4"  # single-card point exposes its card

    p3 = got["p3"]
    assert p3["title"] == long_name[:20] + "…"  # truncate, no suffix
    assert p3["full_title"] == long_name  # full variant skips truncation
    assert p3["card_id"] is None

    # tie: counts equal -> first arrival (min card_key c7 = 'n') wins
    assert got["p4"]["title"] == "n  +1"


def test_geo_point_records_filters_and_coalesce(spark):
    cards = spark.createDataFrame(
        [
            ("k1", "p1", 1.0, 2.0, "unit", "short", "long", True, "x", "o", ["r:x"], []),
            ("k2", "p1", 1.0, 2.0, None, "short", "long", True, "x", "o", ["r:x"], []),
            ("k3", "p1", 1.0, 2.0, None, None, "long", True, "x", "o", ["r:x"], []),
            ("k4", "p2", None, 2.0, "u", "s", "l", True, "x", "o", ["r:x"], []),  # no geometry
        ],
        "card_key string, point_id string, lat double, lon double, "
        "branch_operating_unit string, organization_short_name string, "
        "organization_name string, branch_location_accurate boolean, "
        "response_category string, organization string, "
        "response_ids array<string>, situation_ids array<string>",
    )
    got = {r["card_key"]: r["bname"] for r in geo_point_records(cards).collect()}
    # null-geometry cards drop (to_mapbox.py:102); name chain unit->short->name
    assert got == {"k1": "unit", "k2": "short", "k3": "long"}
