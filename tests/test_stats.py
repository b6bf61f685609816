"""Stats/Report side-output semantics (reference srm_tools/stats.py:82-110)."""

from pyspark.sql import functions as F

from srm_etl_spark.operators.stats import Stats


def test_filter_with_stat_counts(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "v int")
    st = Stats()
    out = st.filter_with_stat(df, "big", F.col("v") >= 3)
    assert sorted(r.v for r in out.collect()) == [3, 4]
    m = st.get("big")
    assert m["seen"] == 4
    assert m["dropped"] == 2


def test_filter_with_stat_null_predicate_counts_as_dropped(spark):
    # filter(keep) drops NULL-predicate rows; the dropped counter must agree
    # so seen == dropped + kept (was: ~NULL -> NULL -> otherwise(0) undercount)
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    st = Stats()
    out = st.filter_with_stat(df, "pos", F.col("v") > 2, report=True)
    assert [r.v for r in out.collect()] == [3]
    m = st.get("pos")
    assert m["seen"] == 3
    assert m["dropped"] == 2
    rejects = st.report("pos").collect()
    assert sorted(r.v if r.v is not None else -1 for r in rejects) == [-1, 1]
