"""Elasticsearch publish protocol: metadata-driven mapping + revision swap.

The reference annotates field descriptors with ``es:*`` hints and generates
the index mapping from them, then publishes with an atomic-ish swap: every
document is stamped with a fresh ``revision`` uuid and, after the bulk load
settles, everything whose revision differs is delete-by-query'd (reference
``operators/derive/es_utils.py:22-70``). Here:

- the hints live in ``StructField.metadata`` (the Spark-native channel);
- ``to_es_actions`` generates the bulk-action JSON lines DISTRIBUTED
  (to_json per partition — the only part that scales with data);
- the HTTP shipping itself stays behind a seam (``ship`` callable) so the
  engine is testable without a cluster and deployable against one.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

# es:type hint → ES mapping snippet (the reference's TYPE_CONVERSION table)
_ES_TYPES = {
    "keyword": {"type": "keyword"},
    "autocomplete": {
        "type": "search_as_you_type",
    },
    "hebrew": {"type": "text", "analyzer": "hebrew"},
    "text": {"type": "text"},
}

_SPARK_TO_ES = {
    "string": {"type": "text"},
    "long": {"type": "long"},
    "integer": {"type": "integer"},
    "double": {"type": "double"},
    "float": {"type": "float"},
    "boolean": {"type": "boolean"},
    "timestamp": {"type": "date"},
    "date": {"type": "date"},
}


def es_mapping(schema: StructType) -> dict:
    """Index mapping generated from column types + ``es:*`` column metadata.

    ``es:type`` overrides the inferred type; ``es:index: false`` disables
    indexing; arrays map to their element type (ES is array-transparent);
    nested structs recurse as ``properties``.
    """
    props: dict = {}
    for f in schema.fields:
        dtype = f.dataType
        if isinstance(dtype, ArrayType):
            dtype = dtype.elementType
        if isinstance(dtype, StructType):
            entry: dict = {"type": "object", "properties": es_mapping(dtype)["properties"]}
        else:
            hint = f.metadata.get("es:type") if f.metadata else None
            entry = dict(_ES_TYPES.get(hint) or _SPARK_TO_ES.get(dtype.typeName(), {"type": "text"}))
        if f.metadata and f.metadata.get("es:index") is False:
            entry["index"] = False
        props[f.name] = entry
    return {"properties": props}


def to_es_actions(df: DataFrame, index: str, id_col: str, revision: str | None = None) -> DataFrame:
    """Bulk-API action lines: (action_json, doc_json) per row, all JVM-side.

    Every document carries the run's ``revision`` stamp for the post-publish
    sweep. Feed partitions of these to the _bulk endpoint.
    """
    revision = revision or uuid.uuid4().hex
    stamped = df.withColumn("revision", F.lit(revision))
    return stamped.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.lit(index).alias("_index"), F.col(id_col).cast("string").alias("_id")
                ).alias("index")
            )
        ).alias("action_json"),
        F.to_json(F.struct(*[F.col(c) for c in stamped.columns])).alias("doc_json"),
    )


def revision_sweep_body(revision: str) -> dict:
    """delete_by_query body removing every doc NOT stamped with `revision` —
    the second half of the reference's swap (es_utils.py:59-70)."""
    return {"query": {"bool": {"must_not": [{"term": {"revision": revision}}]}}}


def publish(
    df: DataFrame,
    index: str,
    id_col: str,
    ship,
    sweep,
    revision: str | None = None,
    settle_seconds: int = 30,
) -> str:
    """Full publish protocol: bulk-ship every partition, settle, sweep.

    ``ship(partition_iter)`` and ``sweep(index, body)`` are injected transports
    (HTTP in production, recorders in tests). Returns the revision used.
    """
    import time  # noqa: PLC0415

    revision = revision or uuid.uuid4().hex
    actions = to_es_actions(df, index, id_col, revision)
    actions.foreachPartition(ship)
    time.sleep(settle_seconds)
    sweep(index, revision_sweep_body(revision))
    return revision
