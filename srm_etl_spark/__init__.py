"""srm_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the query and data-processing capabilities of
kolzchut/srm-etl (see SURVEY.md) as idiomatic Spark: declarative DataFrame
plans over partitioned Parquet, broadcast dimension joins, native column
expressions for the hot path, Arrow-batched pandas UDFs only where semantics
require Python, and Structured Streaming for event data.

Layout
------
- ``session``    — tuned SparkSession factory (AQE, UTC, Arrow).
- ``sources``    — table loaders (Parquet warehouse, JSON/REST/JDBC bridges).
- ``functions``  — scalar/array column-expression kernels (hashing, taxonomy,
                   cleaning, geo, text, scoring) with exact reference
                   semantics.
- ``operators``  — relational + pipeline operators (upsert/merge, dedup,
                   similarity search, windows, derive DAG, autocomplete,
                   stats side-outputs).
- ``sinks``      — writers (Parquet, ES-doc generator with metadata-driven
                   mapping + revision swap, GeoJSON, sitemap, JDBC).
- ``streaming``  — Structured Streaming variants of the event operators.
"""

__version__ = "0.1.0"
