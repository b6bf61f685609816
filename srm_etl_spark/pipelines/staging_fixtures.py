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


def organizations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.concat(F.lit("org-"), F.col("s_suppkey")).alias("id"),
        F.col("s_name").alias("name"),
        F.lower(F.regexp_replace("s_name", r"[^A-Za-z0-9]+", "-")).alias("short_name"),
        F.lit("company").alias("kind"),
        F.lit("ACTIVE").alias("status"),
    )


def locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        F.concat(F.lit("loc-"), F.col("n_nationkey")).alias("key"),
        F.col("n_name").alias("city"),
        (29.5 + (F.col("n_nationkey") % 10) * 0.35).alias("lat"),
        (33.2 + (F.col("n_nationkey") % 12) * 0.3).alias("lon"),
        (F.col("n_nationkey") % 7 == 0).alias("national_service"),
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
    return (
        p.join(owner, p.p_partkey == owner.l_partkey, "inner")
        .select(
            F.concat(F.lit("svc-"), F.col("p_partkey")).alias("id"),
            F.col("p_name").alias("name"),
            F.concat(F.lit("org-"), F.col("l_suppkey")).alias("organization"),
            F.array(
                F.concat_ws(":", F.lit("responses"), F.lower("p_type"), F.lower("p_brand"))
            ).alias("responses"),
            F.array(
                F.concat_ws(
                    ":", F.lit("situations"), F.lit("size"), (F.col("p_size") % 5).cast("string")
                )
            ).alias("situations"),
            F.lit("ACTIVE").alias("status"),
        )
    )
