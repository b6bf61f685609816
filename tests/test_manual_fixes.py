"""ManualFixes applier (reference operators/derive/manual_fixes.py:65-152):
conditional rewrite guards, wildcard, tag normalization, chain order,
status write-back, and the strict missing-fix assertion."""

import pytest
from pyspark.sql import Row, functions as F

from srm_etl_spark.pipelines.manual_fixes import apply_manual_fixes, normalize_ids


def _fixes(spark, rows):
    return spark.createDataFrame(
        rows, "fix_id string, field string, current_value string, fixed_value string"
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "id string, name string, responses array<string>, fixes array<string>",
    )


class TestNormalizeIds:
    def test_set_sort_join(self, spark):
        df = spark.createDataFrame([Row(v=" b , a ,b,, c ")])
        assert df.select(normalize_ids(F.col("v"))).collect()[0][0] == "a,b,c"

    def test_null_is_empty(self, spark):
        df = spark.createDataFrame([Row(v=None)], "v string")
        assert df.select(normalize_ids(F.col("v"))).collect()[0][0] == ""


class TestApplyManualFixes:
    def test_guard_and_wildcard(self, spark):
        rows = _rows(
            spark,
            [
                ("a", "old", ["r1"], ["f1"]),  # matches current → fixed
                ("b", "other", ["r1"], ["f1"]),  # guard fails → untouched
                ("c", "whatever", ["r1"], ["f2"]),  # wildcard → fixed
            ],
        )
        fixes = _fixes(
            spark,
            [("f1", "name", "old", "new"), ("f2", "name", "*", "starred")],
        )
        out, status = apply_manual_fixes(rows, fixes)
        got = {r.id: r.name for r in out.collect()}
        assert got == {"a": "new", "b": "other", "c": "starred"}
        st = {r.fix_id: r.etl_status for r in status.collect()}
        assert st == {"f1": "Active", "f2": "Active"}

    def test_not_fixed_anywhere_is_obsolete(self, spark):
        rows = _rows(spark, [("a", "x", ["r1"], ["f1"])])
        fixes = _fixes(spark, [("f1", "name", "never-matches", "y")])
        out, status = apply_manual_fixes(rows, fixes)
        assert out.collect()[0].name == "x"
        assert status.collect()[0].etl_status == "Obsolete"

    def test_chain_applies_in_row_order(self, spark):
        rows = _rows(
            spark,
            [
                ("fwd", "A", ["r1"], ["f1", "f2"]),  # A→B then B→C
                ("rev", "A", ["r1"], ["f2", "f1"]),  # B→C misses, then A→B
            ],
        )
        fixes = _fixes(spark, [("f1", "name", "A", "B"), ("f2", "name", "B", "C")])
        out, _ = apply_manual_fixes(rows, fixes)
        got = {r.id: r.name for r in out.collect()}
        assert got == {"fwd": "C", "rev": "B"}

    def test_responses_normalize_fix_side_only(self, spark):
        # the FIX side normalizes (strip/dedup/sort); the row side compares
        # as ','.join(sorted(raw elements)) — no strip, no dedup
        rows = _rows(spark, [("a", "n", ["z", "y"], ["f1"])])
        fixes = _fixes(spark, [("f1", "responses", " z ,  y ,z", " c , b ")])
        out, _ = apply_manual_fixes(rows, fixes)
        assert out.collect()[0].responses == "b,c"

    def test_responses_raw_row_elements_not_stripped(self, spark):
        rows = _rows(spark, [("a", "n", ["z", " y", "y"], ["f1"])])
        fixes = _fixes(spark, [("f1", "responses", "z,y", "c")])
        out, status = apply_manual_fixes(rows, fixes)
        # actual ' y,y,z' != normalized 'y,z' → NOT fixed; output is the
        # raw sorted join
        assert out.collect()[0].responses == " y,y,z"
        assert status.collect()[0].etl_status == "Obsolete"

    def test_unfixed_list_field_emits_normalized_string(self, spark):
        rows = _rows(spark, [("a", "n", ["b", "a"], None)])
        fixes = _fixes(spark, [("f1", "name", "zz", "y")])
        out, status = apply_manual_fixes(rows, fixes)
        assert out.collect()[0].responses == "a,b"
        assert status.count() == 0  # f1 never referenced → not in write-back

    def test_null_actual_matches_null_current(self, spark):
        rows = spark.createDataFrame(
            [("a", None, ["f1"])], "id string, name string, fixes array<string>"
        )
        fixes = _fixes(spark, [("f1", "name", None, "filled")])
        out, _ = apply_manual_fixes(rows, fixes)
        assert out.collect()[0].name == "filled"

    def test_strict_raises_on_missing_fix(self, spark):
        rows = _rows(spark, [("a", "x", ["r1"], ["ghost"])])
        fixes = _fixes(spark, [("f1", "name", "x", "y")])
        with pytest.raises(AssertionError, match="ghost"):
            apply_manual_fixes(rows, fixes)
        out, status = apply_manual_fixes(rows, fixes, strict=False)
        assert out.collect()[0].name == "x"
        assert status.count() == 0

    def test_strict_rejects_duplicate_row_ids(self, spark):
        # two rows sharing an id would merge fix chains — strict mode
        # refuses (the reference's rows are unique Airtable record ids)
        rows = _rows(
            spark,
            [("dup", "x", ["r1"], ["f1"]), ("dup", "y", ["r1"], ["f2"])],
        )
        fixes = _fixes(
            spark, [("f1", "name", "x", "a"), ("f2", "name", "y", "b")]
        )
        with pytest.raises(AssertionError, match="duplicate"):
            apply_manual_fixes(rows, fixes)

    def test_null_current_matches_empty_list_field(self, spark):
        # reference runs normalize_ids(None) -> '' on the FIX side, which
        # then matches rows whose responses are empty/None; a null-gated
        # `!= '*'` would leave cur NULL and never fire
        rows = _rows(
            spark,
            [("a", "n", [], ["f1"]), ("b", "n", None, ["f1"]), ("c", "n", ["r1"], ["f1"])],
        )
        fixes = _fixes(spark, [("f1", "responses", None, "x,y")])
        out, status = apply_manual_fixes(rows, fixes)
        got = {r.id: r.responses for r in out.collect()}
        assert got == {"a": "x,y", "b": "x,y", "c": "r1"}
        assert status.collect()[0].etl_status == "Active"

    def test_strict_rejects_fixless_duplicate_of_fix_carrier(self, spark):
        # id duplicated in ROWS where only one copy carries fixes: the
        # chains left-join would hit the fixless twin too — strict refuses
        rows = _rows(
            spark,
            [("dup", "x", ["r1"], ["f1"]), ("dup", "y", ["r1"], None)],
        )
        fixes = _fixes(spark, [("f1", "name", "x", "a")])
        with pytest.raises(AssertionError, match="duplicated among rows"):
            apply_manual_fixes(rows, fixes)
        # non-strict still runs (documented misuse escape hatch)
        out, _ = apply_manual_fixes(rows, fixes, strict=False)
        assert {r.name for r in out.collect()} == {"a", "y"}

    def test_strict_allows_duplicate_ids_without_fixes(self, spark):
        # duplicates are harmless when NO copy carries fixes
        rows = _rows(
            spark,
            [("dup", "x", ["r1"], None), ("dup", "y", ["r1"], None), ("a", "z", ["r1"], ["f1"])],
        )
        fixes = _fixes(spark, [("f1", "name", "z", "zz")])
        out, _ = apply_manual_fixes(rows, fixes)
        assert {r.name for r in out.collect()} == {"x", "y", "zz"}

    def test_strict_rejects_null_fix_id_in_array(self, spark):
        rows = _rows(spark, [("a", "x", ["r1"], ["f1", None])])
        fixes = _fixes(spark, [("f1", "name", "x", "y")])
        with pytest.raises(AssertionError, match="not found"):
            apply_manual_fixes(rows, fixes)

    def test_strict_rejects_null_row_id(self, spark):
        # even a SINGLE null-id row must fail: its chain could never
        # re-attach through the null-rejecting equi-join
        rows = _rows(spark, [(None, "x", ["r1"], ["f1"])])
        fixes = _fixes(spark, [("f1", "name", "x", "y")])
        with pytest.raises(AssertionError, match="null"):
            apply_manual_fixes(rows, fixes)
