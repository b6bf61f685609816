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

# Spark types the reference classifies as table-schema number/integer — those
# (plus geopoint) get an explicit ``index: True`` (es_utils.py:33-34).
_INDEXED_NUMERICS = {"long", "integer", "double", "float", "short", "byte"}

# Field-name suffix rule (es_utils.py:35): the last ``_``-segment of the name
# auto-attaches the hebrew multi-field even without an ``es:hebrew`` hint.
_HEBREW_SUFFIXES = ("name", "purpose", "description", "details", "synonyms", "heb")

def _hebrew_subfield() -> dict:
    # built fresh per property: a shared nested dict would alias every
    # field's mapping to one mutable object
    return {"hebrew": {"type": "text", "analyzer": "hebrew"}}


def es_mapping(schema: StructType) -> dict:
    """Index mapping generated from column types + ``es:*`` column metadata,
    mirroring the reference's ``SRMMappingGenerator._convert_type``
    (``operators/derive/es_utils.py:21-44``):

    - base type inferred from the Spark type (arrays map to their element
      type — ES is array-transparent; nested structs recurse as
      ``properties``); ``es:type: geopoint`` → ``geo_point``; ``es:type:
      any`` → the ``es:itemType`` hint (default string, es_utils.py:25-26);
    - ``es:keyword`` / ``es:autocomplete`` hints REPLACE the base type with
      ``keyword`` / ``search_as_you_type``;
    - number/integer/geopoint fields get ``index: True``;
    - ``es:hebrew`` — or a field name whose last ``_``-segment is one of
      name/purpose/description/details/synonyms/heb — ADDS a
      ``fields.hebrew`` multi-field (text + hebrew analyzer) alongside the
      base type, so both ``card.name`` and ``card.name.hebrew`` resolve;
    - ``es:index: false`` disables indexing (engine extension).

    Struct fields share the hint block for parity (the reference applies
    its rules after _convert_type regardless of base type). Caveat carried
    over with that parity: a keyword/autocomplete/hebrew hint ON a struct
    column produces a mapping ES itself would reject (``fields`` on an
    object type) — the reference's schemas never combine those, and neither
    should callers here; the generator mirrors, it does not police.
    """
    props: dict = {}
    for f in schema.fields:
        dtype = f.dataType
        if isinstance(dtype, ArrayType):
            dtype = dtype.elementType
        md = f.metadata or {}
        hint = md.get("es:type")
        if isinstance(dtype, StructType):
            # recurse, then FALL THROUGH to the shared hint block below: the
            # reference applies keyword/autocomplete/index/hebrew rules after
            # _convert_type on every field regardless of its base type
            # (es_utils.py:27-42), so struct columns get the name-suffix
            # hebrew multi-field and es:index/es:keyword overrides too.
            entry: dict = {"type": "object", "properties": es_mapping(dtype)["properties"]}
        elif hint == "geopoint":
            entry = {"type": "geo_point"}
        elif hint == "any":
            item = md.get("es:itemType", "string")
            entry = dict(_SPARK_TO_ES.get(item, {"type": "text"}))
        else:
            entry = dict(_SPARK_TO_ES.get(dtype.typeName(), {"type": "text"}))
        # type OVERRIDES mutate in place (reference sets prop['type'], keeping
        # sibling keys like a struct's recursed ``properties``)
        if md.get("es:keyword") or hint == "keyword":
            entry["type"] = "keyword"
        if md.get("es:autocomplete") or hint == "autocomplete":
            entry["type"] = "search_as_you_type"
        if dtype.typeName() in _INDEXED_NUMERICS or hint == "geopoint":
            entry["index"] = True
        if (
            md.get("es:hebrew")
            or hint == "hebrew"
            or f.name.split("_")[-1] in _HEBREW_SUFFIXES
        ):
            entry["fields"] = _hebrew_subfield()
        if md.get("es:index") is False:
            entry["index"] = False
        props[f.name] = entry
    return {"properties": props}


def publish_mapping(schema: StructType) -> dict:
    """The mapping :func:`publish` needs: the document mapping plus the
    ``revision`` stamp as an explicit ``keyword`` property. The reference
    adds the revision field with ``es:keyword`` BEFORE dumping
    (es_utils.py:67), so its generated mapping always keyword-maps it —
    the post-publish sweep is an exact ``term`` query on that field and
    must never depend on dynamic mapping choosing an analyzed type."""
    m = es_mapping(schema)
    m["properties"]["revision"] = {"type": "keyword"}
    return m


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


def spool_ship(spool_dir: str):
    """Recorder transport for :func:`publish`: each non-empty partition
    appends its bulk pairs to one ``action \\t doc`` TSV file under
    ``spool_dir``. Pair-per-line keeps read-back order-free (the real wire
    format's alternating lines are certified byte-exact separately, q122);
    ``to_json`` escapes literal tabs, so the separator is unambiguous.
    Driver and executors must share ``spool_dir`` — true in local mode and
    on any shared filesystem; a production transport ships to ES instead."""

    def ship(rows) -> None:
        import os  # noqa: PLC0415
        import uuid as _uuid  # noqa: PLC0415

        fh = None
        try:
            for r in rows:
                if fh is None:
                    fh = open(  # noqa: SIM115
                        os.path.join(spool_dir, f"bulk-{_uuid.uuid4().hex}.tsv"),
                        "w",
                        encoding="utf-8",
                    )
                fh.write(r.action_json + "\t" + r.doc_json + "\n")
        finally:
            if fh is not None:
                fh.close()

    return ship


def recording_sweep(log: list):
    """Sweep transport that records ``(index, body)`` calls (driver-side,
    one tiny dict per publish)."""

    def sweep(index: str, body: dict) -> None:
        log.append((index, body))

    return sweep


def sweep_revision(body: dict) -> str:
    """The revision a recorded :func:`revision_sweep_body` KEEPS (everything
    else is delete-by-query'd)."""
    return body["query"]["bool"]["must_not"][0]["term"]["revision"]


def replay_index_state(spark, publishes: list[tuple[int, str]], doc_schema: str) -> DataFrame:
    """Reconstruct the simulated index's post-bulk state after the LAST of
    ``publishes`` = ``[(seq, spool_dir), ...]``: last-write-wins per ``_id``
    across publish sequence (ES upsert semantics; within one publish ids are
    unique). DISTRIBUTED — spools read back with ``spark.read.text``, docs
    parsed with ``from_json``, dedup via one per-id window; the spool stands
    in for the external cluster's storage, so no index state ever sits on
    the driver."""
    from functools import reduce  # noqa: PLC0415

    from pyspark.sql.window import Window  # noqa: PLC0415

    frames = []
    for seq, d in publishes:
        parts = F.split(F.col("value"), "\t", 2)
        frames.append(
            spark.read.text(d).select(
                F.lit(seq).alias("_seq"),
                F.get_json_object(parts.getItem(0), "$.index._id").alias("_id"),
                parts.getItem(1).alias("_doc"),
            )
        )
    merged = reduce(DataFrame.unionByName, frames)
    w = Window.partitionBy("_id").orderBy(F.col("_seq").desc())
    latest = merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return latest.select(F.from_json("_doc", doc_schema).alias("doc")).select("doc.*")


def publish(
    df: DataFrame,
    index: str,
    id_col: str,
    ship,
    sweep,
    revision: str | None = None,
    settle_seconds: int = 30,
    ensure=None,
) -> str:
    """Full publish protocol: ensure the index, bulk-ship every partition,
    settle, sweep.

    ``ship(partition_iter)`` and ``sweep(index, body)`` are injected transports
    (HTTP in production, recorders in tests); ``ensure(index, mappings)``,
    when given, creates the index from :func:`publish_mapping` before the
    load — the reference's ``dump_to_es`` does this via its mapper class
    (es_utils.py:46-57). Returns the revision used.
    """
    import time  # noqa: PLC0415

    revision = revision or uuid.uuid4().hex
    if ensure is not None:
        ensure(index, publish_mapping(df.schema))
    actions = to_es_actions(df, index, id_col, revision)
    actions.foreachPartition(ship)
    time.sleep(settle_seconds)
    sweep(index, revision_sweep_body(revision))
    return revision
