"""The mapbox derive flows — Spark shape of the reference's
``operators/derive/to_mapbox.py``:

- **geo_data** (``geo_data_flow``, to_mapbox.py:97-203): cards with resolved
  geometry grouped per ``point_id`` (W3 + A2); per point: the most-common
  branch display name becomes the pin ``title`` (truncated at 20 chars with
  an ellipsis, ``'  +N'`` when several distinct names share the point, ``*``
  when a lone inaccurate pin — ``point_title``, :74-86), the most-common
  record category becomes ``response_category`` (:130-136), service/branch
  counts, and ``card_id`` only when exactly one card sits on the point
  (:160-164). The resource is then DUPLICATED and filtered into accurate /
  inaccurate halves (U2, :193-195) for the two tilesets.
- **points** (``points_flow``, to_mapbox.py:206-249): the per-card point
  projection published to ES (``srm__points``) plus the 4-column clusters
  GeoJSON subset (:239-242).

Reference semantics kept, made partitioning-safe: the reference's ``records``
array is its generator arrival order — here every "first/most-common" uses
card_key as the explicit arrival order (min card_key = first occurrence), so
the keeper is deterministic under any partitioning. Counter.most_common ties
resolve to first insertion, reproduced as (count desc, first card_key asc).

Scale shape: ONE shuffle on point_id for the point aggregates (the two mode
keepers are hash aggregates over (point, value) — map-side combinable), the
accurate/inaccurate split is two filters over the same grouped frame, and
the points legs are pure maps over the card surface. The tippecanoe mbtiles
build (:23-37) is an external C binary — out of scope; the upload protocol
is covered by K7 (sinks/rest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_TITLE = 20  # point_title's max_len (to_mapbox.py:75)


def geo_point_records(cards_full: DataFrame) -> DataFrame:
    """The per-card record slice the point grouping consumes: geometry-
    resolved cards only (to_mapbox.py:102), with the branch display name
    coalesced exactly like ``branches()`` (:69-71)."""
    return cards_full.filter(
        F.col("lat").isNotNull() & F.col("lon").isNotNull()
    ).select(
        "point_id",
        "card_key",
        "lat",
        "lon",
        F.coalesce(
            "branch_operating_unit", "organization_short_name", "organization_name"
        ).alias("bname"),
        "branch_location_accurate",
        "response_category",
        "organization",
        "response_ids",
        "situation_ids",
    )


def _mode_by_first(recs: DataFrame, col: str, out: str) -> DataFrame:
    """Counter(...).most_common(1)[0][0] per point: count desc, first
    occurrence (min card_key = arrival order) asc — two hash aggregates,
    both map-side combinable."""
    counts = recs.groupBy("point_id", col).agg(
        F.count(F.lit(1)).alias("_n"), F.min("card_key").alias("_first")
    )
    return counts.groupBy("point_id").agg(
        F.min_by(col, F.struct(-F.col("_n"), F.col("_first"))).alias(out)
    )


def geo_data_surface(recs: DataFrame) -> DataFrame:
    """The per-point geo_data rows (to_mapbox.py:102-181) over a
    :func:`geo_point_records` frame (persist it when also feeding
    :func:`points_surface` — both flows read the same records, like the
    reference's one card_data dump), BEFORE the accurate/inaccurate split —
    callers filter on ``branch_location_accurate`` for the two dumps
    (:193-195)."""
    base = recs.groupBy("point_id").agg(
        F.count(F.lit(1)).alias("service_count"),
        F.max("branch_location_accurate").alias("branch_location_accurate"),
        # records[0]'s geometry in arrival order (join_with_self keeps the
        # group's first branch_geometry)
        F.min_by(F.struct("lon", "lat"), "card_key").alias("_geo"),
        F.countDistinct("bname").alias("branch_count"),
        F.min("card_key").alias("_first_ck"),
    )
    joined = (
        base.join(_mode_by_first(recs, "bname", "_bn"), "point_id")
        .join(_mode_by_first(recs, "response_category", "response_category"), "point_id")
    )
    bn = F.col("_bn")
    truncated = F.when(
        F.length(bn) > _MAX_TITLE,
        F.concat(F.substring(bn, 1, _MAX_TITLE), F.lit("…")),
    ).otherwise(bn)

    def titled(b):
        # '  +{n-1}' (two spaces, to_mapbox.py:82) when several distinct
        # names share the point; a lone inaccurate pin gets '*' (:84-86)
        return (
            F.when(
                F.col("branch_count") > 1,
                F.concat(b, F.lit("  +"), (F.col("branch_count") - 1).cast("string")),
            )
            .when(~F.col("branch_location_accurate"), F.concat(b, F.lit("*")))
            .otherwise(b)
        )

    return joined.select(
        "point_id",
        F.format_string("[%.5f,%.5f]", F.col("_geo.lon"), F.col("_geo.lat")).alias(
            "branch_geometry"
        ),
        "branch_location_accurate",
        "response_category",
        titled(truncated).alias("title"),
        titled(bn).alias("full_title"),
        "service_count",
        "branch_count",
        # the reference emits records[0]['card_id'] only for single-card
        # points (:160-164); the sha1 card_id's preimage card_key stands in
        # (hash determinism is pinned by unit tests, oracles use preimages)
        F.when(F.col("service_count") == 1, F.col("_first_ck")).alias("card_id"),
    )


def points_surface(recs: DataFrame) -> DataFrame:
    """points_flow's ES projection (to_mapbox.py:212-226) over a
    :func:`geo_point_records` frame: one row per geometry-resolved card;
    response_categories is the card's per-response category list (helpers),
    arrays emitted comma-joined."""
    cats = F.transform("response_ids", lambda r: F.split(r, ":").getItem(1))
    return recs.select(
        "card_key",
        "point_id",
        F.format_string("[%.5f,%.5f]", F.col("lon"), F.col("lat")).alias(
            "branch_geometry"
        ),
        F.array_join(cats, ",").alias("response_categories"),
        "response_category",
        "organization",
        F.array_join("response_ids", ",").alias("response_ids"),
        F.array_join("situation_ids", ",").alias("situation_ids"),
    )
