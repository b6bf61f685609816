"""deploy spec sync + the benchmark did-you-mean kernel (reference
operators/deploy/__init__.py:38-49, operators/benchmark/__init__.py:42-68)."""

from pyspark.sql import functions as F

from srm_etl_spark.operators.benchmark import dym_rerank
from srm_etl_spark.operators.deploy import deploy_table


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestDeployTable:
    def test_changed_only_emit(self, spark):
        tgt = _df(spark, [("a", "x"), ("b", "y")], "id string, syn string")
        src = _df(spark, [("a", "x"), ("b", "z")], "id string, syn string")
        out = deploy_table(tgt, src, "id", ["syn"])
        assert {(r.id, r.syn) for r in out.collect()} == {("b", "z")}

    def test_add_missing(self, spark):
        tgt = _df(spark, [("a", "x")], "id string, syn string")
        src = _df(spark, [("a", "x"), ("c", "new")], "id string, syn string")
        out = deploy_table(tgt, src, "id", ["syn"], add_missing=True)
        assert {(r.id, r.syn) for r in out.collect()} == {("c", "new")}
        # without add_missing the source-only row is dropped
        assert deploy_table(tgt, src, "id", ["syn"]).count() == 0

    def test_null_safe_diff_and_rename(self, spark):
        tgt = _df(spark, [("a", None), ("b", None), ("c", "v")], "id string, lat string")
        src = _df(spark, [("a", None), ("b", "9"), ("c", None)], "id string, lat string")
        out = deploy_table(tgt, src, "id", ["lat:fixed_lat"])
        got = {(r.id, r.fixed_lat) for r in out.collect()}
        # null==null is NOT a change; null→value and value→null are
        assert got == {("b", "9"), ("c", None)}

    def test_target_only_rows_never_emitted(self, spark):
        tgt = _df(spark, [("only-tgt", "x")], "id string, syn string")
        src = _df(spark, [], "id string, syn string")
        assert deploy_table(tgt, src, "id", ["syn"], add_missing=True).count() == 0


class TestDymRerank:
    def _run(self, spark, pa_rows, total):
        df = spark.createDataFrame(
            [(pa_rows, total)],
            "pa array<struct<key string, doc_count double>>, total int",
        )
        return df.select(dym_rerank(F.col("pa"), F.col("total")).alias("d")).collect()[0].d

    def test_low_total_suppresses(self, spark):
        assert self._run(spark, [("אבג", 20.0)], 9) is None

    def test_incumbent_wins_inside_gate(self, spark):
        # one candidate, doc_count 20, total 30: threshold=10 < 20 <= 50
        assert self._run(spark, [("אבגדהו", 20.0)], 30) == "אבגדהו"

    def test_over_shard_size_suppresses(self, spark):
        assert self._run(spark, [("אבגדהו", 51.0)], 120) is None

    def test_log_length_boost_flips_winner(self, spark):
        # incumbent len 3 dc 20; challenger len 27 dc 15 →
        # 15 * ln(27)/ln(3) = 15*3 = 45 > 20 → challenger wins
        pa = [("אבג", 20.0), ("א" * 27, 15.0)]
        assert self._run(spark, pa, 60) == "א" * 27
        # reference parity: same arithmetic
        import math

        assert 15.0 * math.log(27) / math.log(3) == 45.0

    def test_stable_tie_keeps_earlier_candidate(self, spark):
        # reference parity: Python's stable sorted(...) keeps the first
        # candidate on an exact scaled tie
        pa = [("אבגד", 20.0), ("הוזח", 20.0)]
        assert self._run(spark, pa, 30) == "אבגד"

    def test_below_threshold_suppresses(self, spark):
        # total 120 → threshold min(50,120)/3 = 16.67; best dc 10 → None
        assert self._run(spark, [("אבגדה", 10.0)], 120) is None
