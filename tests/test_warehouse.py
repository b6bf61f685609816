"""Warehouse layout guarantees: bucketed joins are shuffle-free, partitioned
reads prune directories (sinks/warehouse.py)."""

import pytest
from pyspark.sql import functions as F

from srm_etl_spark.sinks.warehouse import write_bucketed, write_partitioned
from srm_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _simple_plan(df):
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("wh")
    orders = load_table(spark, SF, "orders", spread=False)
    customer = load_table(spark, SF, "customer", spread=False)
    write_bucketed(
        orders, "b_orders", ["o_custkey"], num_buckets=4,
        sort_cols=["o_custkey"], path=str(warehouse / "b_orders"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", ["o_custkey"], num_buckets=4,
        sort_cols=["o_custkey"], path=str(warehouse / "b_customer"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    saved_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = _simple_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "co-bucketed equi-join must not shuffle"
        # bucket-sorted inputs: no extra Sort below the merge join either
        n_rows = joined.count()
        assert n_rows == spark.table("b_orders").join(
            F.broadcast(spark.table("b_customer")), "o_custkey"
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_threshold)


def test_bucket_pruning_single_key(spark, bucketed_tables):
    # a point predicate on the bucket column scans 1 of 4 buckets; the
    # auto-bucketed-scan heuristic would down-plan a bare filter+scan to an
    # unbucketed read, so pin it on for the assertion
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table("b_orders").filter(F.col("o_custkey") == 7)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        assert "SelectedBucketsCount: 1 out of 4" in plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_ivf_partitioned_probe_prunes_to_probed_cells(spark, tmp_path):
    # SCALE.md §2 closure: once the IVF-assigned corpus is written
    # partitionBy(cell), a probe's scan must carry the probed-cell IN list
    # in PartitionFilters and agree with the in-memory ivf_topk answer
    from srm_etl_spark.operators.similarity import ivf_topk, ivf_topk_partitioned

    emb = load_table(spark, SF, "embeddings", spread=False)
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf_cells")
    got = ivf_topk_partitioned(spark, emb, queries, path, k=4, nprobe=2)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = got._jdf.queryExecution().explainString(mode)
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and any("_cell IN" in ln or "_cell#" in ln for ln in scan), scan
    expect = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, queries, k=4, nprobe=2).collect()
    }
    assert {(r.query_id, r.neighbor_id, r.rank) for r in got.collect()} == expect


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    events = load_table(spark, SF, "events", spread=False)
    write_partitioned(events, path, ["event_type"])
    got = spark.read.parquet(path).filter(F.col("event_type") == "click")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = got._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters: [isnotnull(event_type" in plan
    # pruned read returns exactly the one partition's rows
    assert got.count() == events.filter(F.col("event_type") == "click").count()
