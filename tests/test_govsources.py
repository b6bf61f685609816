"""gov-source verticals: the soproc click scraper's schema-time concatenate
config (reference operators/soproc/click_scraper.py:96-115), its per-cell
clean semantics (decode_and_clean, :55-68), and the end-to-end fixture run.
"""

from pyspark.sql import Row, functions as F

from srm_etl_spark.pipelines import govsources as GOV


class TestClickConcatConfig:
    def test_keep_fields_pass_through(self):
        cfg = GOV.click_concat_config(["cat", "Name", "other"])
        assert cfg["cat"] == ("cat", "")
        assert cfg["Name"] == ("Name", "")
        # unsuffixed non-KEEP columns are dropped entirely
        assert "other" not in cfg

    def test_suffix_priority_order(self):
        # '' < i < ss < t < s < base64 < f < is — lowest index wins
        cfg = GOV.click_concat_config(["X_s", "X_t", "X_ss", "X_i"])
        assert cfg["X"] == ("X_i", "i")
        cfg = GOV.click_concat_config(["Y_base64", "Y_s"])
        assert cfg["Y"] == ("Y_s", "s")
        cfg = GOV.click_concat_config(["Z_f", "Z_is"])
        assert cfg["Z"] == ("Z_f", "f")

    def test_no_lists_skips_low_priority(self):
        # Short_Description is NO_LISTS: candidates with priority < 3
        # ('', 'i', 'ss') are popped in favor of the scalar suffixes
        cfg = GOV.click_concat_config(
            ["Short_Description_ss", "Short_Description_t", "Short_Description_i"]
        )
        assert cfg["Short_Description"] == ("Short_Description_t", "t")

    def test_no_lists_keeps_t_when_alone(self):
        cfg = GOV.click_concat_config(["Short_Description_t"])
        assert cfg["Short_Description"] == ("Short_Description_t", "t")

    def test_bare_short_description_not_a_candidate(self):
        # the bare column's "suffix" is 'Description' — not in DT_SUFFIXES,
        # so it never competes (the fixture's ''-vs-_t pair)
        cfg = GOV.click_concat_config(["Short_Description", "Short_Description_t"])
        assert cfg["Short_Description"] == ("Short_Description_t", "t")

    def test_full_fixture_resolution(self, spark, sf_dir):
        cfg = GOV.click_concat_config(GOV.click_raw(spark, sf_dir).columns)
        assert cfg["id"] == ("id_i", "i")
        assert cfg["Description"] == ("Description_base64", "base64")
        assert cfg["FamilyName"] == ("FamilyName_ss", "ss")
        assert cfg["distribution_channel"] == ("distribution_channel_is", "is")


class TestClickCellClean:
    """decode_and_clean truth table: base64-or-passthrough, tag strip,
    &nbsp;/CR scrub, 'NULL' → null, and — the round-6 ADVICE fix — genuine
    nulls SURVIVE cleaning (the reference only touches isinstance(v, str))."""

    def _clean(self, spark, values, suffix):
        from srm_etl_spark.functions.html import base64_or_passthrough, sanitize_html

        df = spark.createDataFrame([Row(v=x) for x in values], "v string")
        col = F.col("v")
        x = col
        if suffix == "base64":
            x = base64_or_passthrough(x)
        x = sanitize_html(x)
        x = F.replace(x, F.lit("\r"), F.lit(""))
        x = F.regexp_replace(x, r"^\s+|\s+$", "")
        x = F.when(x == "NULL", F.lit(None)).otherwise(x)
        x = F.when(col.isNotNull(), x)
        return [r[0] for r in df.select(x).collect()]

    def test_base64_decode_and_tag_strip(self, spark):
        import base64

        payload = base64.b64encode("<p>שלום&nbsp;עולם</p>".encode()).decode()
        assert self._clean(spark, [payload], "base64") == ["שלום עולם"]

    def test_base64_passthrough_on_non_b64(self, spark):
        assert self._clean(spark, ["טקסט רגיל"], "base64") == ["טקסט רגיל"]

    def test_null_string_scrubbed(self, spark):
        assert self._clean(spark, ["NULL"], "t") == [None]

    def test_genuine_null_survives(self, spark):
        # regression: sanitize_html coalesces NULL→'' — cleaning must not
        assert self._clean(spark, [None], "t") == [None]

    def test_cr_and_trim(self, spark):
        assert self._clean(spark, [" abc\r "], "t") == ["abc"]
        # space collapse runs before CR removal: the CR's flanking spaces
        # survive as one each (pinned: matches the fixture/oracle pair)
        assert self._clean(spark, ["א  \r  ב"], "t") == ["א  ב"]


class TestClickScrape:
    def test_null_group_id_rows_dropped(self, spark, sf_dir):
        # at sf0.001: 200 parts; he/type/group/channel filters → 105 rows
        out = GOV.click_scrape(spark, sf_dir)
        assert out.count() == 105

    def test_details_omit_null_paragraphs(self, spark, sf_dir):
        out = GOV.click_scrape(spark, sf_dir).filter(F.col("catalog_number") == 1)
        row = out.collect()[0]
        # k=1: k%3!=0, k%4!=0, k%5!=0 — only the two always-present fields
        assert row.details == "<p>תקציר 1</p><p>תיאור מלא 1</p>"
        assert "<p></p>" not in row.details

    def test_deductible_enum(self, spark, sf_dir):
        rows = {
            r.catalog_number: r.payment_required
            for r in GOV.click_scrape(spark, sf_dir).collect()
        }
        assert rows[1] == "no"  # k%4==1
        assert rows[2] == "sometimes"  # k%4==2
        assert rows[3] == "yes"  # k%4==3, k%8==3
        assert rows[15] is None  # k%4==3, k%8==7 → 'אחר' unmapped
        assert rows[4] is None  # Deducitable null
