"""Synthetic staging tables derived deterministically from the warehouse.

The reference's staging database is six curated tables (Organizations,
Branches, Services, Locations, Responses, Situations — SURVEY §1.3). The
driver's warehouse has no such tables, so the derive pipeline is exercised on
staging frames mapped deterministically from the TPC-H-ish tables:

- organizations ← supplier        (org id = ``org-<suppkey>``)
- branches      ← customer        (branch of org ``org-(custkey % |supplier| + 1)``,
                                   located in the customer's nation)
- locations     ← nation          (lat/lon synthesized from the key)
- services      ← part            (service id = ``svc-<partkey>``; offered by the
                                   org that supplies it most, via lineitem)
- responses/situations ← part types/brands as colon-taxonomy ids

Everything here is a pure DataFrame mapping (and mirrored in the oracle SQL of
the derive queries), so the whole DAG stays verifiable against DuckDB.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


GOV_KIND = "משרד ממשלתי"


def organizations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    # short_name 'Supplier' is embedded verbatim in every s_name
    # ('Supplier#0000...') so org_name_parts exercises its match path;
    # phone: every 4th org gets a short 1-prefixed hotline (card_score's
    # national-hotline boost), the rest a long local number; every 7th org is
    # governmental (card_score's kind boost).
    hotline = F.concat(F.lit("1"), F.lpad((k % 800).cast("string"), 3, "0"))
    local = F.concat(
        F.lit("0"),
        ((k % 6) + 2).cast("string"),
        F.lit("-"),
        F.lpad((k % 9000000).cast("string"), 7, "0"),
    )
    return s.select(
        F.concat(F.lit("org-"), k).alias("id"),
        F.col("s_name").alias("name"),
        F.lit("Supplier").alias("short_name"),
        F.when(k % 7 == 0, F.lit(GOV_KIND)).otherwise(F.lit("company")).alias("kind"),
        F.when(k % 4 == 0, hotline).otherwise(local).alias("phone"),
        # every 3rd org has no description — the orgs ES surface carries the
        # field as-is (to_es.py:304), so both shapes must flow through
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("ארגון "), F.col("s_name")))
        .alias("description"),
        F.lit("ACTIVE").alias("status"),
    )


def locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    # nationkey % 11 == 10 places the location outside the valid bbox so the
    # card pipeline's geometry-validation filter has rows to drop
    lat = 29.5 + (k % 10) * 0.35 + F.when(k % 11 == 10, F.lit(20.0)).otherwise(F.lit(0.0))
    return n.select(
        F.concat(F.lit("loc-"), k).alias("key"),
        F.col("n_name").alias("city"),
        lat.alias("lat"),
        (33.2 + (k % 12) * 0.3).alias("lon"),
        (k % 7 == 0).alias("national_service"),
    )


@functools.lru_cache(maxsize=64)
def _supplier_count(sf_dir: str) -> int:
    """|supplier| is a catalog fact — one pyarrow footer read per sf_dir,
    cached (was a Spark count() job per derive run)."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    return pq.ParquetFile(f"{sf_dir}/supplier.parquet").metadata.num_rows


def branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n_orgs = _supplier_count(sf_dir)
    return c.select(
        F.concat(F.lit("branch-"), F.col("c_custkey")).alias("id"),
        F.concat(F.lit("org-"), F.col("c_custkey") % n_orgs).alias("organization"),
        F.concat(F.lit("loc-"), F.col("c_nationkey")).alias("location"),
        F.col("c_name").alias("name"),
        # street part of the branch address; the city is appended after the
        # location join (flat_branches) so address_parts can find it
        F.concat(F.lit("רחוב "), (F.col("c_custkey") % 90 + 1).cast("string")).alias(
            "address"
        ),
        # 4 of 5 branches name an operating unit — the mapbox point title
        # coalesces unit -> org short name -> org name (to_mapbox.py:69-71).
        # The unit repeats per location (nation-keyed) and is > 20 chars, so
        # per-location points get a truncated unit mode title while the
        # national point (many distinct units, each a sliver) falls back to
        # the short-name mode — both title paths live.
        F.when(
            F.col("c_custkey") % 5 != 0,
            F.concat(
                F.lit("יחידת רווחה אזורית מספר "), F.col("c_nationkey").cast("string")
            ),
        )
        .otherwise(F.lit(None).cast("string"))
        .alias("operating_unit"),
        # geocoding accuracy: whole nations on the % 5 == 2 stripe are
        # inaccurate (their points land in the inaccurate tileset dump,
        # to_mapbox.py:193-195) and a sparse per-branch stripe elsewhere
        # exercises the point-level max-aggregation's mixing
        ((F.col("c_nationkey") % 5 != 2) & (F.col("c_custkey") % 53 != 0)).alias(
            "location_accurate"
        ),
        # Airtable rows carry a last-modified stamp; every 3rd branch has
        # none, so the cards ES flow's max-of-parseable-dates enrichment
        # (to_es.py:85-94) exercises the null leg. ISO date strings: max()
        # on the fixed format equals max() on the parsed datetimes.
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.format_string(
                "2024-%02d-%02d",
                F.col("c_custkey") % 12 + 1,
                F.col("c_custkey") % 28 + 1,
            )
        )
        .alias("last_modified"),
        F.when(F.col("c_acctbal") < 0, "INACTIVE").otherwise("ACTIVE").alias("status"),
    )


def services(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service per part, owned by the org (supplier) that ships it most;
    deterministic ownership via (count desc, suppkey asc) ranking."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    freq = li.groupBy("l_partkey", "l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    # Ownership = argmax by (n desc, suppkey asc) — a max_by aggregate, not a
    # ranked window: saves the per-partition sort and reuses map-side partial
    # aggregation; identical keeper to row_number()==1 over that ordering.
    owner = freq.groupBy("l_partkey").agg(
        F.max_by("l_suppkey", F.struct(F.col("n"), -F.col("l_suppkey"))).alias("l_suppkey")
    )
    k = F.col("p_partkey")
    # every 6th service carries the reference's meser id prefix (card_score's
    # is_meser branch); descriptions cycle null / too-short / real so the
    # has_description boost sees all three shapes; boost ∈ {0, .25, .5}
    svc_id = F.when(
        k % 6 == 0, F.concat(F.lit("meser-s-"), k.cast("string"))
    ).otherwise(F.concat(F.lit("svc-"), k.cast("string")))
    description = (
        F.when(k % 5 == 0, F.lit(None).cast("string"))
        .when(k % 5 == 1, F.lit("srv"))
        .otherwise(F.col("p_name"))
    )
    return (
        p.join(owner, p.p_partkey == owner.l_partkey, "inner")
        .select(
            svc_id.alias("id"),
            F.col("p_name").alias("name"),
            F.concat(F.lit("org-"), F.col("l_suppkey")).alias("organization"),
            F.array(
                F.concat_ws(":", F.lit("responses"), F.lower("p_type"), F.lower("p_brand")),
                F.concat_ws(":", F.lit("responses"), F.lit("mkt"), F.lower("p_brand")),
            ).alias("responses"),
            F.array(
                F.concat_ws(
                    ":", F.lit("situations"), F.lit("size"), (F.col("p_size") % 5).cast("string")
                ),
                F.concat_ws(":", F.lit("situations"), F.lit("brand"), F.lower("p_brand")),
            ).alias("situations"),
            description.alias("description"),
            ((k % 3).cast("double") * 0.25).alias("boost"),
            # every 4th service has no stamp (see branches.last_modified)
            F.when(k % 4 == 0, F.lit(None).cast("string"))
            .otherwise(
                F.format_string("2024-%02d-%02d", k % 12 + 1, k % 25 + 2)
            )
            .alias("last_modified"),
            F.lit("ACTIVE").alias("status"),
        )
    )


def _taxonomy_dim(services_df: DataFrame, arr_col: str, name_prefix: str) -> DataFrame:
    """Taxonomy dimension rows derived from the ids the services actually
    carry (parents included): the engine twin of the reference's curated
    Airtable Responses/Situations tables (SURVEY §1.3) — id, display name,
    synonyms, breadcrumbs, status. Deterministic: name/synonyms/breadcrumbs
    are pure functions of the id; every id whose length % 7 == 0 is INACTIVE
    so the publish flows' status filter (to_es.py:232/274) has rows to drop."""
    from ..functions.taxonomy import update_taxonomy_with_parents  # noqa: PLC0415
    from ..operators.session_cache import keep_checkpointed_pooled  # noqa: PLC0415

    ids = services_df.select(
        F.explode(update_taxonomy_with_parents(F.col(arr_col))).alias("id")
    ).distinct()
    seg = F.split("id", ":")
    out = ids.select(
        "id",
        F.concat(F.lit(name_prefix), F.element_at(seg, -1)).alias("name"),
        F.replace(F.col("id"), F.lit(":"), F.lit(" ")).alias("synonyms"),
        F.array_join(F.slice(seg, 1, F.size(seg) - 1), " / ").alias("breadcrumbs"),
        F.when(F.length("id") % 7 == 0, F.lit("INACTIVE"))
        .otherwise(F.lit("ACTIVE"))
        .alias("status"),
    )
    # Taxonomy dimensions are consumed by several publish legs per query
    # (responses + situations surfaces each scan-explode-distinct the
    # services fixture) — one truncating pin per dimension serves them all;
    # taxonomy tables are curated and bounded at any corpus scale. Joins
    # against the pin must broadcast the OTHER side explicitly (a checkpoint
    # scan has no size statistics).
    return keep_checkpointed_pooled(out, "fixture_taxonomy_dim", eager=False)


_PLACE_KINDS = ["region", "city", "town", "village", "hamlet", "suburb"]


def places_source(locations: DataFrame) -> DataFrame:
    """Location-bounds rows shaped like the bounds datapackage the reference
    downloads (to_es.py:164, 186-192): key, display-name array, [W,S,E,N]
    bounds, place kind. Deterministic from the locations dimension; the kind
    cycles through one more value than the places score map knows so the
    ``scores.get(place, 1)`` default is exercised
    (pipelines/es_publish.py:PLACE_SCORES)."""
    nk = F.substring("key", 5, 10).cast("int")
    return locations.select(
        F.concat(F.lit("place-"), nk.cast("string")).alias("key"),
        F.array(F.col("city"), F.concat(F.lit("איזור "), F.col("city"))).alias("name"),
        F.array(
            F.col("lon") - 0.1, F.col("lat") - 0.1,
            F.col("lon") + 0.1, F.col("lat") + 0.1,
        ).alias("bounds"),
        F.element_at(
            F.array(*[F.lit(p) for p in _PLACE_KINDS]), (nk % 6) + 1
        ).alias("place"),
    )


def responses_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Responses taxonomy table (reference AIRTABLE_RESPONSE_TABLE)."""
    return _taxonomy_dim(services(spark, sf_dir), "responses", "מענה ")


def situations_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Situations taxonomy table (reference AIRTABLE_SITUATION_TABLE)."""
    return _taxonomy_dim(services(spark, sf_dir), "situations", "מצב ")
