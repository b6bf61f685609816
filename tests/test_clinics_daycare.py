"""mental_health_clinics + day_care/child_care/kolzchut_orgs verticals:
vocabulary validate, clinic hashing/grouping, description assembly, the
organization matcher truth table, and payload shapes."""

from pyspark.sql import functions as F

from srm_etl_spark.functions.hashing import hasher_py
from srm_etl_spark.pipelines import clinics as MHC
from srm_etl_spark.pipelines import daycare as DC


class TestClinics:
    def test_missing_vocabulary_scrub_includes_hmo5(self, spark, sf_dir):
        clean = MHC.mhc_clean(spark, sf_dir)
        # g%6==5 maps to 'כל הקופות' which is itself a missing value → null
        hmos = {r.hmo for r in clean.select("hmo").distinct().collect()}
        assert "כל הקופות" not in hmos
        assert None in hmos

    def test_filters_drop_clinics_and_missing_streets(self, spark, sf_dir):
        raw_n = MHC.mhc_raw(spark, sf_dir).count()
        clean = MHC.mhc_clean(spark, sf_dir)
        assert clean.count() < raw_n
        assert clean.filter(F.col("age_group").contains("קליניקה")).count() == 0

    def test_address_containment_rule(self, spark, sf_dir):
        clean = MHC.mhc_clean(spark, sf_dir)
        # g%6==3 streets embed the city → address == street (no ', city')
        embedded = clean.filter(F.col("address").rlike("^רחוב [0-9]+ עיר ")).select("address")
        assert embedded.count() > 0
        for r in embedded.distinct().collect():
            assert ", " not in r.address

    def test_clinic_id_reference_parity_sha1(self, spark, sf_dir):
        # default hash kernel is the reference's sha1[:8] over the
        # '|'-joined non-null parts (clinic_hash, ref :157-165)
        clean = MHC.mhc_clean(spark, sf_dir)
        r = clean.select("id", "name", "phone_numbers", "address", "hmo").first()
        pre = "|".join(v for v in [r.name, r.phone_numbers, r.address, r.hmo] if v)
        assert r.id == "mhclinic-" + hasher_py(pre)

    def test_description_sections_and_order(self, spark, sf_dir):
        br = MHC.mhc_branches(MHC.mhc_clean(spark, sf_dir))
        descs = [r.description for r in br.collect()]
        assert any("סוגי התערבויות: " in d for d in descs)
        assert any("מומחיות המרפאה: " in d for d in descs)
        for d in descs:
            if "סוגי התערבויות" in d and "מומחיות המרפאה" in d:
                assert d.index("סוגי התערבויות") < d.index("מומחיות המרפאה")
            # every present section closes with the double newline
            assert d == "" or d.endswith("\n\n")

    def test_service_situations_prefix_constant_first(self, spark, sf_dir):
        sv = MHC.mhc_services(MHC.mhc_clean(spark, sf_dir))
        for r in sv.select("situations").collect():
            assert r.situations[0] == MHC.MENTAL_ILLNESS_TAG

    def test_branch_org_default_fallback(self, spark, sf_dir):
        br = MHC.mhc_branches(MHC.mhc_clean(spark, sf_dir))
        orgs = {r.organization for r in br.collect()}
        assert MHC.ORGS[""][0] in orgs  # null-hmo groups → default org
        assert MHC.ORGS["מכבי"][0] in orgs


class TestDaycareMatcher:
    def test_truth_table(self, spark, sf_dir):
        clean = DC.daycare_clean(spark, sf_dir)
        got = {
            r.org_name_raw: r.organization_id
            for r in clean.select("org_name_raw", "organization_id").distinct().collect()
        }
        assert got["עיריית חיפה"] == "rec-hf"  # direct
        assert got["עירית חיפה"] == "rec-hf"  # normalize עירית→עיריית
        assert got["מועצה אזורית גליל-עליון"] == "rec-gl"  # hyphen→space
        assert got["מועצה מקומית באר יעקב"] == "rec-by"  # space→hyphen
        assert got["מועצה אזורית עמק"] == "rec-emek"  # direct post-expansion
        assert got["מועצה מקומית כפר-סבא"] == "rec-ks"  # expansion + swap
        assert got["עיריית תל-אביב"] == "rec-tv"  # dim-side normalize
        assert got["מועצה אזורית אין-כזה"] is None
        assert got["חברה בעמ"] is None
        assert got[""] is None

    def test_council_prefix_expansion(self, spark):
        df = spark.createDataFrame(
            [("מ.א. גליל",), ("מ. אזורית עמק",), ("מ.מקומית כפר",), ("מ.מ. יבנה",), ("עיריית חיפה",), ("סתם שם",)],
            "n string",
        )
        out = [r[0] for r in df.select(DC.replace_council_name(F.col("n"))).collect()]
        assert out == [
            "מועצה אזורית גליל",
            "מועצה אזורית עמק",
            "מועצה מקומית כפר",
            "מועצה מקומית יבנה",
            "עיריית חיפה",
            "סתם שם",
        ]

    def test_phone_and_hp_fixes(self, spark, sf_dir):
        clean = DC.daycare_clean(spark, sf_dir)
        for r in clean.select("phone", "org_number", "organization_id").collect():
            assert r.phone.startswith("0") and 8 <= len(r.phone) <= 11 + 1
            if r.organization_id is None:
                # unmatched rows keep the (possibly trimmed) ח.פ — never
                # the raw 13-digit '11…00' form
                assert not (len(r.org_number) >= 13 and r.org_number.startswith("11"))

    def test_branch_description_format(self, spark, sf_dir):
        br = DC.daycare_branches(DC.daycare_clean(spark, sf_dir))
        r = br.first()
        assert " \n " in r.description

    def test_childcare_sector_details(self, spark, sf_dir):
        sv = DC.childcare_services(spark, sf_dir)
        rows = sv.select("details", "situations").distinct().collect()
        by_details = {r.details: r.situations for r in rows}
        assert "" in by_details  # יהודי → empty details
        assert by_details[""] == ["human_situations:age_group:infants"]
        arabic = by_details[DC.CHILDCARE_DETAILS_PREFIX + "ערבי"]
        # literal order preserved (reference maps the list as-is)
        assert arabic == DC.SECTOR_SITUATIONS["ערבי"]

    def test_kz_orgs_distinct_sorted_shape(self, spark, sf_dir):
        kz = DC.kz_orgs(spark, sf_dir)
        ids = [r.id for r in kz.collect()]
        assert len(ids) == len(set(ids))
        assert all(i.startswith("5000000") for i in ids)
