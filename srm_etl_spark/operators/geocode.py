"""Geocoding operator — the Spark shape of the reference's geocode pipeline
(reference ``operators/geocode/__init__.py:19-156``).

The reference walks the Locations table row-by-row, calling a primary
geocoder (govmap, with EPSG:2039→WGS84 transform), falling back to a second
provider (google) when the primary misses or lands below the accuracy bar,
and reverse-geocoding for a missing city — all single-threaded, one HTTP
round-trip per row (``operators/geocode/__init__.py:20-107``).

The Spark reformulation separates what scales from what doesn't:

- **Incremental selection** (``unresolved_locations``) — the reference's
  filter_rows pair (``__init__.py:145-146``: rows missing any of
  resolved_lat/lon/city and not already NOT_FOUND) as a native filter, so at
  100 TB only the unresolved slice leaves the scan.
- **Keyword dedup before I/O** — many locations share an address string; the
  external calls are issued once per *distinct* keyword, then joined back.
  At cluster scale this is the difference between O(rows) and O(distinct
  addresses) calls against a rate-limited API.
- **Provider calls in `mapInPandas`** over a coalesced keyword table —
  ``max_concurrency`` bounds how many partitions (= concurrent API clients)
  hit the provider; providers are injected callables so tests (and offline
  runs) use deterministic resolvers, mirroring how the reference wraps its
  session (``__init__.py:109-138``).
- **Pure rules as native expressions** — national-service short-circuit
  (``__init__.py:33-38``), pluscode detection (``:26``), the accuracy bar
  (reference ``operators/derive/helpers.py:10`` ACCURATE_TYPES), address
  cleanup (strip ', ישראל' suffix, ' | ' → ', '; ``:103-107``), and the
  'unknown' city fallback (``:100-101``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# reference operators/derive/helpers.py:10
ACCURATE_TYPES = (
    "ROOFTOP",
    "RANGE_INTERPOLATED",
    "STREET_MID_POINT",
    "ADDR_V1",
    "ADDRESS_POINT",
    "ADDRESS",
)

# reference operators/geocode/__init__.py:33-34
NATIONAL_KEYWORDS = ("שירות ארצי", "כל הארץ")
NATIONAL_ADDRESS = "שירות ארצי"

RESOLVED_SCHEMA = StructType(
    [
        StructField("keyword", StringType()),
        StructField("accuracy", StringType()),
        StructField("provider", StringType()),
        StructField("resolved_address", StringType()),
        StructField("resolved_lat", DoubleType()),
        StructField("resolved_lon", DoubleType()),
        StructField("resolved_city", StringType()),
        StructField("geo_status", StringType()),
    ]
)

Resolver = Callable[[str], dict | None]


def unresolved_locations(locations: DataFrame) -> DataFrame:
    """Rows still needing geocoding — reference ``__init__.py:145-146``."""
    return locations.filter(
        (
            F.col("resolved_lat").isNull()
            | F.col("resolved_lon").isNull()
            | F.col("resolved_city").isNull()
        )
        & (F.coalesce(F.col("status"), F.lit("")) != "NOT_FOUND")
    )


def is_pluscode(col) -> Column:
    """OLC detection — 5th char '+' (reference ``__init__.py:26``)."""
    return (F.length(col) > 4) & (F.substring(col, 5, 1) == "+")


def clean_resolved_address(col) -> Column:
    """Suffix/system-separator cleanup — reference ``__init__.py:103-107``."""
    stripped = F.regexp_replace(col, ", ישראל$", "")
    return F.replace(stripped, F.lit(" | "), F.lit(", "))


def geocode_locations(
    locations: DataFrame,
    resolver: Resolver,
    fallback: Resolver | None = None,
    reverse: Callable[[float, float], str | None] | None = None,
    id_col: str = "id",
    alt_col: str = "alternate_address",
    max_concurrency: int = 8,
) -> DataFrame:
    """Geocode the unresolved slice of ``locations``.

    ``resolver``/``fallback`` take a keyword and return a dict with any of
    ``accuracy, provider, resolved_address, resolved_lat, resolved_lon,
    resolved_city`` (or None for a miss); ``reverse`` takes (lat, lon) and
    returns a city or None. The fallback fires when the primary misses or
    resolves below ACCURATE_TYPES — reference ``__init__.py:63-66``. Rows
    whose both providers miss get ``geo_status='NOT_FOUND'``
    (``__init__.py:89-90``); everything else ``'VALID'`` (``:27``).
    """
    todo = unresolved_locations(locations)
    keyed = todo.withColumn(
        "_keyword", F.coalesce(F.col(alt_col), F.col(id_col)).cast("string")
    )
    keywords = (
        keyed.select(F.col("_keyword").alias("keyword"))
        .filter(F.col("keyword").isNotNull() & (F.col("keyword") != ""))
        .distinct()
        .coalesce(max_concurrency)
    )

    def resolve_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for kw in pdf["keyword"]:
                row = {
                    "keyword": kw,
                    "accuracy": None,
                    "provider": None,
                    "resolved_address": None,
                    "resolved_lat": None,
                    "resolved_lon": None,
                    "resolved_city": None,
                    "geo_status": "VALID",
                }
                if kw in NATIONAL_KEYWORDS:
                    # reference __init__.py:33-38
                    row.update(
                        accuracy="NATIONAL_SERVICE",
                        provider="national",
                        resolved_address=NATIONAL_ADDRESS,
                    )
                    out.append(row)
                    continue
                pluscode = len(kw) > 4 and kw[4] == "+"
                hit = None if pluscode else resolver(kw)
                if hit:
                    row.update({k: v for k, v in hit.items() if k in row})
                def _missing(r=row):
                    return any(
                        r[f] is None
                        for f in ("resolved_lat", "resolved_lon", "resolved_address")
                    )

                if _missing() or row["accuracy"] not in ACCURATE_TYPES:
                    # reference __init__.py:63-91 (incl. pluscode accuracy pin)
                    hit = fallback(kw) if fallback else None
                    if hit:
                        row.update({k: v for k, v in hit.items() if k in row})
                        if pluscode:
                            row.update(accuracy="ADDR_V1", resolved_address=kw)
                # NOT_FOUND whenever the row is still unresolved after the
                # (optional) fallback — independent of whether a fallback was
                # supplied (reference __init__.py:89-90 marks such rows so
                # they stop being reselected next run).
                if _missing():
                    row["geo_status"] = "NOT_FOUND"
                if (
                    row["resolved_lat"] is not None
                    and row["resolved_lon"] is not None
                    and row["resolved_city"] is None
                ):
                    # reference __init__.py:92-101
                    city = (
                        reverse(row["resolved_lat"], row["resolved_lon"])
                        if reverse
                        else None
                    )
                    row["resolved_city"] = city or "unknown"
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in RESOLVED_SCHEMA.fields])

    resolved = keywords.mapInPandas(resolve_batches, schema=RESOLVED_SCHEMA)
    # prefix the provider outputs: the locations table carries columns of the
    # same names (that's what we're filling in), so the join must not collide
    resolved = resolved.select(
        "keyword", *[F.col(f.name).alias(f"_geo_{f.name}") for f in RESOLVED_SCHEMA.fields if f.name != "keyword"]
    )
    joined = keyed.join(resolved, keyed._keyword == resolved.keyword, "left")
    filled = joined
    for c in (
        "accuracy",
        "provider",
        "resolved_address",
        "resolved_lat",
        "resolved_lon",
        "resolved_city",
    ):
        new = F.col(f"_geo_{c}")
        filled = filled.withColumn(
            c, F.coalesce(new, F.col(c)) if c in keyed.columns else new
        )
    # pluscode pin: the kernel (keyword-space, deduped) can only pin the
    # keyword; the reference pins the ROW's id (__init__.py:86-88) — restore
    # that here where the row is in scope again.
    pluscode_pinned = is_pluscode(F.col("_keyword")) & (F.col("accuracy") == "ADDR_V1")
    filled = filled.withColumn(
        "resolved_address",
        F.when(pluscode_pinned, F.col(id_col).cast("string")).otherwise(
            F.col("resolved_address")
        ),
    )
    return (
        filled.withColumn(
            "resolved_address", clean_resolved_address(F.col("resolved_address"))
        )
        .withColumn("status", F.coalesce(F.col("_geo_geo_status"), F.col("status")))
        .drop(
            "_keyword",
            "keyword",
            *[f"_geo_{f.name}" for f in RESOLVED_SCHEMA.fields if f.name != "keyword"],
        )
    )
