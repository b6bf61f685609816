"""The derive DAG — the reference's flagship pipeline, Spark-first.

Reproduces the semantic chain of ``operators/derive/to_dp.py`` (reference
repo; stage boundaries at :288-406, :450-575, :577-698, :756-920):

    staging (organizations, branches, locations, services)
      → flat_branches   (branch ⋈ location ⋈ org, deduped, org branch count)
      → flat_services   (service exploded per branch of its org)
      → flat_table      (service × branch, PK-deduped)
      → card_data       (taxonomy merge + parent expansion + stable card ids)

Differences from the reference are deliberate Spark-first re-designs:

- the reference's ``merge_duplicate_branches`` is an order-dependent
  streaming dedup (first row wins); here it is an explicit-order
  ``row_number() == 1`` per duplicate key — same keeper, provably
  deterministic under any partitioning;
- ``branch_mapping`` driver-side dict state (reference ``to_dp.py:928-932``)
  becomes a mapping DataFrame joined where needed;
- per-org branch counts are a window aggregate, not generator state;
- every stage is a pure DataFrame → DataFrame function: Catalyst sees the
  whole DAG and pushes filters/prunes columns across stage boundaries —
  stages materialize only when the caller persists them.

All joins are equi-joins: org/location dimensions broadcast; the
service × branch fan-out shuffles on the join key and AQE handles skew (the
reference's welfare-ministry org owns a large share of branches — the same
skew shape appears here when one org supplies most parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hasher
from ..functions.taxonomy import update_taxonomy_with_parents
from . import staging_fixtures as FIX


def flat_branches(
    branches: DataFrame, locations: DataFrame, organizations: DataFrame
) -> DataFrame:
    """branch ⋈ location (left, J1) ⋈ organization (inner, J2), deduplicated
    per (organization, location) with a deterministic keeper (A6), plus the
    per-org branch count attached to every row (W3)."""
    b = branches.filter(F.upper(F.trim("status")) == "ACTIVE")
    loc = locations.select(
        F.col("key").alias("location"), "city", "lat", "lon", "national_service"
    )
    org = organizations.filter(F.upper(F.trim("status")) == "ACTIVE").select(
        F.col("id").alias("organization"),
        F.col("name").alias("organization_name"),
        F.col("kind").alias("organization_kind"),
    )
    joined = b.join(F.broadcast(loc), "location", "left").join(
        F.broadcast(org), "organization", "inner"
    )
    dup_w = Window.partitionBy("organization", "location").orderBy(F.asc("id"))
    merged = (
        joined.withColumn("_rn", F.row_number().over(dup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    count_w = Window.partitionBy("organization")
    return merged.withColumn(
        "organization_branch_count", F.count(F.lit(1)).over(count_w)
    ).select(
        F.col("id").alias("branch_id"),
        "organization",
        "organization_name",
        "organization_kind",
        "location",
        F.col("name").alias("branch_name"),
        F.col("city").alias("branch_city"),
        "lat",
        "lon",
        "national_service",
        "organization_branch_count",
    )


def flat_services(services: DataFrame, flat_branches_df: DataFrame) -> DataFrame:
    """Service exploded per branch of its organization (J4 + U4): branches
    are collapsed per org FIRST (collect_set keyed by org — shuffle bounded by
    |orgs|), then exploded against services."""
    svc = services.filter(F.upper(F.trim("status")) == "ACTIVE")
    branches_per_org = flat_branches_df.groupBy("organization").agg(
        F.array_sort(F.collect_set("branch_id")).alias("org_branches")
    )
    return (
        svc.join(branches_per_org, "organization", "inner")
        .select(
            F.col("id").alias("service_id"),
            F.col("name").alias("service_name"),
            "organization",
            "responses",
            "situations",
            F.explode("org_branches").alias("branch_id"),
        )
    )


def flat_table(flat_services_df: DataFrame, flat_branches_df: DataFrame) -> DataFrame:
    """service × branch join (J2) + composite-PK dedup (A8)."""
    joined = flat_services_df.join(
        flat_branches_df.drop("organization"), "branch_id", "inner"
    )
    w = Window.partitionBy("service_id", "branch_id").orderBy(F.asc("service_name"))
    return joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def card_data(flat_table_df: DataFrame, autotag_rules: DataFrame | None = None) -> DataFrame:
    """Cards: one row per (service, branch) with merged + parent-expanded
    taxonomy ids (F13/F14) and the stable short card id (F22,
    sha1-of-concat — byte-compatible with the reference's hasher).

    ``autotag_rules`` (optional) applies the rule-driven tag injection
    between taxonomy expansion and the string join — the reference's
    card_data_flow order (to_dp.py:810 autotagging after normalize/map,
    before scoring)."""
    response_ids = update_taxonomy_with_parents(F.col("responses"))
    situation_ids = update_taxonomy_with_parents(F.col("situations"))
    cards = flat_table_df.select(
        hasher(F.col("branch_id"), F.col("service_id")).alias("card_id"),
        F.concat(F.col("branch_id"), F.col("service_id")).alias("card_key"),
        "service_id",
        "service_name",
        "branch_id",
        "branch_name",
        "branch_city",
        "organization",
        "organization_name",
        "organization_branch_count",
        "national_service",
        response_ids.alias("response_ids"),
        situation_ids.alias("situation_ids"),
    )
    if autotag_rules is not None:
        from .autotagging import apply_auto_tagging  # noqa: PLC0415

        cards = apply_auto_tagging(
            cards,
            autotag_rules,
            field_cols=("organization_name", "service_name"),
            key_col="card_key",
        ).drop("auto_tagged")
    return cards.withColumn(
        "response_ids", F.array_join(F.col("response_ids"), ",")
    ).withColumn("situation_ids", F.array_join(F.col("situation_ids"), ","))


_DERIVE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def run_derive(spark: SparkSession, sf_dir: str, use_cache: bool = True) -> dict[str, DataFrame]:
    """Build every derive stage from the staging fixtures; lazy except
    flat_branches, which feeds BOTH flat_services and flat_table — persisted
    so the branch ⋈ location ⋈ org dedup runs once per action, not twice
    (the reference materializes this stage to disk for the same reason,
    to_dp.py:405).

    Memoized per (session, sf_dir): q34/q35/q36 all start from this DAG, and
    rebuilding it would re-register an identical persisted plan each time
    (CacheManager dedups the data, but the lookup + analysis cost repeats)."""
    from pyspark import StorageLevel  # noqa: PLC0415

    memo_key = (id(spark), sf_dir)
    if use_cache and memo_key in _DERIVE_CACHE:
        return _DERIVE_CACHE[memo_key]

    orgs = FIX.organizations(spark, sf_dir)
    locs = FIX.locations(spark, sf_dir)
    brs = FIX.branches(spark, sf_dir)
    svcs = FIX.services(spark, sf_dir)
    fb = flat_branches(brs, locs, orgs).persist(StorageLevel.MEMORY_AND_DISK)
    fs = flat_services(svcs, fb)
    ft = flat_table(fs, fb)
    cards = card_data(ft)
    stages = {
        "flat_branches": fb,
        "flat_services": fs,
        "flat_table": ft,
        "card_data": cards,
    }
    if use_cache:
        _DERIVE_CACHE[memo_key] = stages
    return stages
