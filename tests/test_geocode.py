"""Geocode operator (operators/geocode.py) with injected deterministic
providers — mirrors reference operators/geocode/__init__.py semantics."""

from pyspark.sql import functions as F

from srm_etl_spark.operators.geocode import (
    clean_resolved_address,
    geocode_locations,
    is_pluscode,
    unresolved_locations,
)


def _locations(spark):
    rows = [
        # (id, alternate_address, status, resolved_lat, resolved_lon, resolved_city)
        ("loc-a", "Herzl 1, Tel Aviv", None, None, None, None),
        ("loc-b", None, None, None, None, None),  # keyword falls back to id
        ("שירות ארצי", None, None, None, None, None),  # national service
        ("loc-d", "Nowhere St 0", None, None, None, None),  # both providers miss
        ("loc-e", "Done 5", "VALID", 32.0, 34.0, "Tel Aviv"),  # already resolved
        ("loc-f", "Old 9", "NOT_FOUND", None, None, None),  # skipped: NOT_FOUND
    ]
    return spark.createDataFrame(
        rows,
        "id string, alternate_address string, status string, "
        "resolved_lat double, resolved_lon double, resolved_city string",
    )


def test_unresolved_selection(spark):
    got = unresolved_locations(_locations(spark)).select("id").collect()
    ids = sorted(r.id for r in got)
    # resolved row and NOT_FOUND row excluded
    assert ids == ["loc-a", "loc-b", "loc-d", "שירות ארצי"]


def test_geocode_end_to_end(spark):
    # providers defined in-function so cloudpickle ships them by value (the
    # test module itself is not importable on executors)
    def _resolver(kw):
        if kw == "Herzl 1, Tel Aviv":
            return {
                "accuracy": "ADDRESS_POINT",
                "provider": "govmap",
                "resolved_address": "הרצל 1, תל אביב, ישראל",
                "resolved_lat": 32.06,
                "resolved_lon": 34.77,
            }
        return None

    def _fallback(kw):
        if kw == "loc-b":
            return {
                "accuracy": "ROOFTOP",
                "provider": "google",
                "resolved_address": "Fallback | St",
                "resolved_lat": 31.8,
                "resolved_lon": 35.2,
                "resolved_city": "Jerusalem",
            }
        return None

    def _reverse(lat, lon):
        return "Tel Aviv" if abs(lat - 32.06) < 0.1 else None

    out = geocode_locations(
        _locations(spark), _resolver, fallback=_fallback, reverse=_reverse
    )
    rows = {r["id"]: r for r in out.collect()}

    a = rows["loc-a"]  # primary hit + reverse city + address cleanup
    assert a["provider"] == "govmap"
    assert a["resolved_address"] == "הרצל 1, תל אביב"  # ', ישראל' stripped
    assert a["resolved_city"] == "Tel Aviv"
    assert a["status"] == "VALID"

    b = rows["loc-b"]  # keyword = id, fallback provider, ' | ' cleanup
    assert b["provider"] == "google"
    assert b["resolved_address"] == "Fallback, St"
    assert b["resolved_city"] == "Jerusalem"

    nat = rows["שירות ארצי"]  # national-service short-circuit
    assert nat["accuracy"] == "NATIONAL_SERVICE"
    assert nat["provider"] == "national"
    assert nat["resolved_lat"] is None

    d = rows["loc-d"]  # both providers missed
    assert d["status"] == "NOT_FOUND"


def test_keyword_dedup_one_call_per_distinct(spark):
    # 6 rows sharing 2 distinct keywords -> resolver sees each keyword once
    rows = [(f"loc-{i}", "Same Addr %d" % (i % 2), None, None, None, None) for i in range(6)]
    df = spark.createDataFrame(
        rows,
        "id string, alternate_address string, status string, "
        "resolved_lat double, resolved_lon double, resolved_city string",
    )
    from pyspark.sql.functions import lit  # noqa: PLC0415

    calls = spark.sparkContext.accumulator(0)

    def counting_resolver(kw):
        calls.add(1)
        return {
            "accuracy": "ADDRESS",
            "provider": "p",
            "resolved_address": kw,
            "resolved_lat": 1.0,
            "resolved_lon": 2.0,
            "resolved_city": "c",
        }

    out = geocode_locations(df, counting_resolver)
    assert out.count() == 6
    assert calls.value == 2


def test_pluscode_and_cleanup_exprs(spark):
    df = spark.createDataFrame(
        [("8G4Q+XF something",), ("regular address",)], "s string"
    )
    got = df.select(is_pluscode(F.col("s")).alias("p")).collect()
    assert [r.p for r in got] == [True, False]
    c = spark.createDataFrame([("a | b, ישראל",)], "s string").select(
        clean_resolved_address(F.col("s")).alias("c")
    ).first()
    assert c.c == "a, b"


def test_primary_miss_without_fallback_is_not_found(spark):
    # no fallback supplied: a primary miss must still mark the row NOT_FOUND
    # (it previously stayed VALID with null coordinates and was reselected
    # every run)
    locs = spark.createDataFrame(
        [("loc-x", "Unknown 1", None, None, None, None)],
        "id string, alternate_address string, status string, "
        "resolved_lat double, resolved_lon double, resolved_city string",
    )

    def miss(kw):
        return None

    out = geocode_locations(locs, resolver=miss, fallback=None).collect()
    assert len(out) == 1
    assert out[0]["status"] == "NOT_FOUND"


def test_pluscode_pin_uses_row_id_not_keyword(spark):
    # pluscode rows resolve through the fallback; the pinned resolved_address
    # must be the ROW's id (reference __init__.py:86-88), not the deduped
    # keyword (here: the alternate address)
    locs = spark.createDataFrame(
        [("8G4P+VX Tel Aviv", "8G4P+VX somewhere", None, None, None, None)],
        "id string, alternate_address string, status string, "
        "resolved_lat double, resolved_lon double, resolved_city string",
    )

    def miss(kw):
        return None

    def fb(kw):
        return dict(resolved_lat=32.07, resolved_lon=34.79, resolved_city="TLV")

    out = geocode_locations(locs, resolver=miss, fallback=fb).collect()
    assert len(out) == 1
    assert out[0]["accuracy"] == "ADDR_V1"
    assert out[0]["resolved_address"] == "8G4P+VX Tel Aviv"
    assert out[0]["status"] == "VALID"
