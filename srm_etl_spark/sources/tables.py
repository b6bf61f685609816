"""Parquet warehouse table loaders.

The reference's inter-stage IR is datapackage directories of CSV+JSON
(``operators/derive/to_dp.py:227,405,574,697,919`` in the reference); here the
canonical IR is Parquet — columnar, splittable, predicate-pushdown-capable —
read lazily so Catalyst prunes columns and pushes filters into the scan.
"""

from __future__ import annotations

import functools
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..session import parse_byte_size

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@functools.lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer.

    Spark can only read those as long (``spark.sql.legacy.parquet.nanosAsLong``,
    set by the session factory); we restore proper TimestampType below. One
    footer read on the driver per distinct path (cached — bench/driver load
    the same tables hundreds of times).
    """
    import pyarrow as pa  # noqa: PLC0415

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


@functools.lru_cache(maxsize=256)
def _file_bytes(path: str) -> int:
    return os.path.getsize(path)


def load_table(spark: SparkSession, sf_dir: str, name: str, spread: bool = True) -> DataFrame:
    """Lazily read one warehouse table; never materializes on the driver.

    ``spread``: single-row-group parquet files scan as ONE partition, which
    serializes every pre-shuffle expression (regex, shingling, hashing) on one
    core. When the scan has fewer partitions than the cluster's parallelism,
    repartition it — a tiny shuffle locally, and a no-op at real scale where
    inputs are already split into many files/row-groups.
    """
    path = f"{sf_dir}/{name}.parquet"
    # The warehouse carries TIMESTAMP(NANOS) columns, which Spark rejects by
    # default. The conf is runtime-settable, and callers (driver harness,
    # notebooks) supply their own sessions — so set it here, not only in the
    # session factory, or the read fails with PARQUET_TYPE_ILLEGAL.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — conf locked down; reading may still work
        pass
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        # Integer nanos div 1000 → micros; double division would lose precision
        # (ns epoch values exceed 2^53). Only applies when the scan actually
        # surfaced the column as a long — newer Spark reads TIMESTAMP(NANOS)
        # natively as timestamp_ntz (micros-truncated), needing no rewrite.
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if spread:
        # Scan parallelism ≈ ceil(file_bytes / maxPartitionBytes), and a
        # single-row-group file can't split below one partition per file.
        # Deciding from the (cached) file size avoids df.rdd.getNumPartitions,
        # which converts the plan to an RDD on every load — measurable fixed
        # cost when the bench loads tables hundreds of times.
        parallelism = spark.sparkContext.defaultParallelism
        max_bytes = parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"),
            default=128 << 20,
        )
        est_partitions = max(1, _file_bytes(path) // max_bytes)
        if est_partitions < parallelism // 2:
            df = df.repartition(parallelism)
    if os.environ.get("SPARK_GRAFT_RETRY") == "1":
        df = _with_task_retry_fault(df)
    return df


def _with_task_retry_fault(df: DataFrame) -> DataFrame:
    """SPARK_GRAFT_RETRY=1 — tenth invariance axis: task-failure/retry
    determinism. Every EVEN-numbered partition of every table scan FAILS its
    first task attempt with a real exception, so the scheduler (session
    factory runs ``local[N, 4]`` under the axis) re-executes those tasks —
    the lost-executor shape of a 100 TB run, where any stage can see a mix
    of first-attempt and retried tasks. The full registry must hash-MATCH
    the clean run: this catches kernels whose output depends on attempt
    count, partial re-execution, or non-deterministic per-task state that
    only a retry would expose. The injector is schema-preserving and
    otherwise an identity pass-through."""
    schema = df.schema

    def inject(batches):
        from pyspark import TaskContext  # noqa: PLC0415

        ctx = TaskContext.get()
        if (
            ctx is not None
            and ctx.attemptNumber() == 0
            and ctx.partitionId() % 2 == 0
        ):
            raise RuntimeError(
                "SPARK_GRAFT_RETRY fault injection: first attempt of even "
                f"partition {ctx.partitionId()} dies (expected; retried)"
            )
        yield from batches

    return df.mapInPandas(inject, schema)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}


def load_datapackage(spark: SparkSession, path: str, resource: str | None = None) -> DataFrame:
    """S2: read a datapackage directory (the reference's inter-stage IR,
    written by sinks/files.py:write_datapackage or the reference's
    dump_to_path) — the ``datapackage.json`` manifest's field list drives a
    TYPED distributed read of the resource files, so the loop
    write_datapackage -> load_datapackage is lossless (q120 hash-gates it).

    ``resource`` selects by name when the package carries several; default is
    the first. Only the manifest is driver-side (bytes of JSON); the resource
    read is a normal lazy file scan.
    """
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    with open(os.path.join(path, "datapackage.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)
    resources = manifest["resources"]
    res = (
        resources[0]
        if resource is None
        else next((r for r in resources if r["name"] == resource), None)
    )
    if res is None:
        names = [r.get("name") for r in resources]
        raise ValueError(
            f"datapackage at {path!r} has no resource named {resource!r}; "
            f"available: {names}"
        )
    ddl = ", ".join(f"`{f['name']}` {f['type']}" for f in res["schema"]["fields"])
    rdir = os.path.join(path, res["path"])
    fmt = res.get("format", "csv")
    if fmt == "csv":
        return spark.read.schema(ddl).option("header", "true").csv(rdir)
    if fmt == "json":
        return spark.read.schema(ddl).json(rdir)
    return spark.read.parquet(rdir)
