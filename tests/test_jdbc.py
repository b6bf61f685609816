"""S7 JDBC round-trip against an in-process database.

Derby ships on Spark's classpath (it backs the Hive metastore), so its
embedded driver gives a real JDBC engine with zero external services: write a
table through the K2 sink, read it back through the S7 source — including the
partitioned read path, whose WHERE-range clauses Derby actually executes.
"""

import pytest
from pyspark.sql import functions as F

URL = None  # set per-session below


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "srmdb"
    return f"jdbc:derby:{db};create=true"


def _seed(spark, derby_url):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("row-"), F.col("id")).alias("label"),
    )
    from srm_etl_spark.sinks.jdbc import write_jdbc

    ddl = write_jdbc(df, derby_url, "people", indexed_fields=["grp"])
    return ddl


def test_jdbc_roundtrip_plain_query(spark, derby_url):
    _seed(spark, derby_url)
    from srm_etl_spark.sources.connectors import jdbc_query

    out = jdbc_query(spark, derby_url, 'SELECT "k", "grp", "label" FROM people WHERE "grp" = 3')
    rows = out.collect()
    assert len(rows) == 14  # ids 3, 10, ..., 94
    assert all(r["grp"] == 3 for r in rows)
    assert {r["label"] for r in rows} == {f"row-{i}" for i in range(3, 100, 7)}


def test_jdbc_partitioned_read_covers_all_rows(spark, derby_url):
    _seed(spark, derby_url)
    from srm_etl_spark.sources.connectors import jdbc_query

    out = jdbc_query(
        spark,
        derby_url,
        'SELECT "k", "grp", "label" FROM people',
        partition_column='"k"',
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    # the ranged clauses must partition, not duplicate or drop
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 100
    assert out.agg(F.sum("k")).first()[0] == sum(range(100))


def test_index_ddl_returned(spark, derby_url):
    ddl = _seed(spark, derby_url)
    assert ddl == ['CREATE INDEX IF NOT EXISTS "idx_people_grp" ON "people" ("grp")']
