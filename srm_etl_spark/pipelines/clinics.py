"""Mental-health-clinics vertical, Spark-first.

Reference ``operators/mental_health_clinics/__init__.py:135-281``: a
datagovil datastore fetch renamed through FIELD_RENAME, the HMO code→name
map, the missingValues *vocabulary* validate (P10 — any cell equal to one
of MISSING_VALUES becomes null, including an HMO that mapped to
'כל הקופות'), the not-a-clinic / no-address filters, phone-number regex
extraction, the address/city containment rule, the sha-short clinic id
(srm_tools/hash.py), then TWO join_with_self aggregations:

- branches (:202-231): group by clinic id; set-agg phones/interventions/
  expertise/intake_wait; the titled description assembly (split on
  ``[.,\\n]``, min-length filter, upper, set-dedup); org id + urls from the
  ORGS table by HMO (default fallback).
- services (:235-258): group by service name ('מרפאת בריאות נפש ' +
  age_group); branch-id set; SITUATIONS age-group expansion prepended with
  the mental-illness tag; constant responses/data_sources; name-keyed id.

Documented divergences: the reference joins Python *sets* (arbitrary,
hash-seed-dependent order) — every set here is sorted before joining so
output is deterministic; the service id uses the hasher kernel instead of
``slugify`` (python-slugify is absent here; the operative property — a
stable unique id derived from the name — is preserved); the registry
queries pass a sha256 hash kernel so the DuckDB oracle can reproduce ids
(the default remains the reference's sha1, test-pinned).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hasher
from ..sources.tables import load_table

HMOS = {1: "לאומית", 2: "מכבי", 3: "כללית", 4: "מאוחדת", 5: "כל הקופות"}

MISSING_VALUES = [
    "אין מומחיות מיוחדת",
    "לא קיים",
    "אין נתונים",
    "לא",
    "אין",
    "כל הקופות",
    "כל סוגי הטיפולים",
]

SITUATIONS = {
    "מבוגרים": [
        "human_situations:age_group:adults",
        "human_situations:age_group:young_adults",
        "human_situations:age_group:seniors",
    ],
    "טיפול יום-מבוגרים": [
        "human_situations:age_group:adults",
        "human_situations:age_group:young_adults",
        "human_situations:age_group:seniors",
    ],
    "מבוגרים-יועץ במרפאה ראשונית(ליאזון)": [
        "human_situations:age_group:adults",
        "human_situations:age_group:young_adults",
        "human_situations:age_group:seniors",
    ],
    "ילדים ונוער": [
        "human_situations:age_group:children",
        "human_situations:age_group:teens",
    ],
    "ילדים ונוער-יועץ במרפאה ראשונית(ליאזון)": [
        "human_situations:age_group:children",
        "human_situations:age_group:teens",
    ],
    "טיפול יום-נוער": ["human_situations:age_group:teens"],
    "נוער": ["human_situations:age_group:teens"],
}

# hmo name -> (org id, urls); '' key is the default (reference ORGS table)
ORGS = {
    "לאומית": ("srm0010", "https://www.leumit.co.il/heb/Rights/mentalhealth/"),
    "מכבי": ("srm0011", "https://www.maccabi4u.co.il/New/eligibilites/2062/"),
    "כללית": (
        "srm0012",
        "https://www.clalit.co.il/he/your_health/family/mental_health/Pages/clalit_mental_health_clinics.aspx",
    ),
    "מאוחדת": ("srm0013", "https://www.meuhedet.co.il/מאוחדת-לנפש/"),
    "": (
        "srm0019",
        "https://www.health.gov.il/Subjects/mental_health/treatment/clinics/Pages/default.aspx",
    ),
}

DATA_SOURCE_TEXT = (
    'המידע התקבל מ<a target="_blank" href="https://www.health.gov.il/Subjects/'
    'mental_health/treatment/clinics/Pages/mental-clinics.aspx">משרד הבריאות</a>'
)
MENTAL_ILLNESS_TAG = "human_situations:disability:mental_illness"
RESPONSES = [
    "human_services:health:mental_health_care",
    "human_services:place:health:clinic:mental_health_clinic",
]
SERVICE_NAME_PREFIX = "מרפאת בריאות נפש "
PHONE_RE = "[0-9-]{7,}"
SPLIT_RE = "[.,\\n]"

# The seven age-group keys in fixture rotation order.
AGE_GROUPS = [
    "מבוגרים",
    "ילדים ונוער",
    "נוער",
    "טיפול יום-נוער",
    "מבוגרים-יועץ במרפאה ראשונית(ליאזון)",
    "ילדים ונוער-יועץ במרפאה ראשונית(ליאזון)",
    "טיפול יום-מבוגרים",
]


def _scrub_missing(col: Column) -> Column:
    """P10 vocabulary validate: a cell equal to any MISSING_VALUES entry
    becomes null (update_schema(missingValues) + validate, ref :181-182)."""
    return F.when(col.isin(*MISSING_VALUES), F.lit(None)).otherwise(col)


def mhc_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stand-in for the datagovil datastore rows, post
    FIELD_RENAME. ``g = p_partkey % 40`` is the physical-clinic group
    (name/phone/address/hmo constant within g, so the clinic hash groups
    ~5 rows per id at sf0.001); per-row k varies interventions/expertise.
    Exercises: missing-vocabulary cells (incl. the hmo-5 'כל הקופות'
    trap), the not-a-clinic drop, the no-address drop, the city-in-street
    address rule, multi-number phone text, and zero/blank intake waits."""
    p = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    g = k % 40
    city = F.concat(F.lit("עיר "), (g % 7).cast("string"))
    street = F.when(g % 5 == 4, F.lit("אין נתונים")).otherwise(
        F.when(
            g % 6 == 3,
            F.concat(F.lit("רחוב "), g.cast("string"), F.lit(" עיר "), (g % 7).cast("string")),
        ).otherwise(F.concat(F.lit("רחוב "), g.cast("string")))
    )
    age = F.when(g % 9 == 8, F.lit("קליניקה פרטית"))
    for i, a in enumerate(AGE_GROUPS):
        age = age.when(g % 7 == i, F.lit(a))
    phone = F.concat(F.lit("טל 02-65"), (g + 100).cast("string"))
    phone = F.when(
        g % 4 == 1, F.concat(phone, F.lit(" וגם 050-00"), (g + 100).cast("string"))
    ).otherwise(phone)
    expertise = (
        F.when(k % 5 == 0, F.lit("אין מומחיות מיוחדת"))
        .when(k % 5 == 1, F.lit("חרדה.דיכאון"))
        .when(k % 5 == 2, F.lit("חרדה"))
        .when(k % 5 == 3, F.lit("טראומה,פוסט-טראומה"))
        .otherwise(F.lit("ליווי"))
    )
    interventions = (
        F.when(k % 4 == 0, F.lit("כל סוגי הטיפולים"))
        .when(k % 4 == 1, F.lit("CBT"))
        .when(k % 4 == 2, F.lit("DBT.קבוצתי"))
        .otherwise(F.lit("פרטני"))
    )
    return p.select(
        F.concat(F.lit("מרפאה "), g.cast("string")).alias("name"),
        city.alias("city"),
        age.alias("age_group"),
        F.when((k % 4 == 0) | (k % 12 == 0), F.lit(None).cast("string"))
        .otherwise((k % 12).cast("string"))
        .alias("intake_wait"),
        phone.alias("phone_numbers"),
        expertise.alias("expertise"),
        interventions.alias("interventions"),
        street.alias("street_address"),
        (g % 6).cast("int").alias("hmo"),
    )


def mhc_clean(spark: SparkSession, sf_dir: str, hash_fn: Callable[..., Column] = hasher) -> DataFrame:
    """Load → hmo map → missing-vocabulary scrub → filters → phone regex →
    address rule → clinic id (ref :135-199)."""
    df = mhc_raw(spark, sf_dir)
    hmo = F.lit(None).cast("string")
    for code, name in HMOS.items():
        hmo = F.when(F.col("hmo") == code, F.lit(name)).otherwise(hmo)
    df = df.withColumn("hmo", hmo)
    for c in ["name", "city", "age_group", "intake_wait", "phone_numbers", "expertise", "interventions", "street_address", "hmo"]:
        df = df.withColumn(c, _scrub_missing(F.col(c)))
    df = df.filter(~F.col("age_group").contains("קליניקה")).filter(
        F.col("street_address").isNotNull()
    )
    df = df.withColumn(
        "phone_numbers",
        F.array_join(F.regexp_extract_all(F.col("phone_numbers"), F.lit(PHONE_RE), F.lit(0)), "\n"),
    )
    df = df.withColumn(
        "address",
        F.when(
            F.col("street_address").contains(F.col("city")), F.col("street_address")
        ).otherwise(F.concat_ws(", ", "street_address", "city")),
    ).withColumn("location", F.trim(F.col("address")))
    # clinic_hash (ref :157-165): '|'-joined non-null parts, short hash.
    # The reference joins filter(None, items) — empties drop alongside nulls
    # (e.g. a phone cell whose regex matched nothing is ''), so nullif('')
    # each component before the concat_ws (which skips only nulls).
    parts = [F.nullif(F.col(c), F.lit("")) for c in ("name", "phone_numbers", "address", "hmo")]
    return df.withColumn(
        "id",
        F.concat(F.lit("mhclinic-"), hash_fn(F.concat_ws("|", *parts))),
    ).drop("street_address", "city")


def _snippets(col: Column, min_len: int) -> Column:
    """description() inner loop (ref :135-152): split each set element on
    ``[.,\\n]``, keep parts longer than ``min_len``, upper-case, set-dedup.
    Sorted for determinism (the reference joins a raw Python set)."""
    parts = F.flatten(
        F.transform(
            col,
            lambda v: F.filter(
                F.transform(F.split(v, SPLIT_RE), lambda s: F.upper(s)),
                lambda s: F.length(s) > min_len,
            ),
        )
    )
    return F.array_sort(F.array_distinct(parts))


def mhc_branches(clean: DataFrame) -> DataFrame:
    """join_with_self by clinic id (ref :202-231) + description assembly +
    ORGS constants."""
    agg = clean.groupBy("id").agg(
        F.first("name").alias("name"),
        F.first("address").alias("address"),
        F.first("location").alias("location"),
        F.first("hmo").alias("hmo"),
        F.collect_set("phone_numbers").alias("phones"),
        F.collect_set("interventions").alias("interventions"),
        F.collect_set("expertise").alias("expertise"),
        F.collect_set("intake_wait").alias("intake_wait"),
    )
    segs = []
    for field, title, min_len in [
        ("interventions", "סוגי התערבויות", 2),
        ("expertise", "מומחיות המרפאה", 2),
        ("intake_wait", "המתנה ממוצעת לאינטק (שבועות)", 0),
    ]:
        sn = _snippets(F.col(field), min_len)
        segs.append(
            F.when(
                F.size(sn) > 0,
                F.concat(F.lit(title + ": "), F.array_join(sn, ", "), F.lit("\n\n")),
            ).otherwise(F.lit(""))
        )
    # phone dedup across rows: lines re-split, ''-dropped, sorted (ref :215)
    phones = F.array_sort(
        F.array_distinct(
            F.filter(
                F.flatten(F.transform(F.col("phones"), lambda v: F.split(v, "\n"))),
                lambda s: s != "",
            )
        )
    )
    org = F.lit(ORGS[""][0])
    urls = F.lit(ORGS[""][1])
    for name, (oid, u) in ORGS.items():
        if name:
            org = F.when(F.col("hmo") == name, F.lit(oid)).otherwise(org)
            urls = F.when(F.col("hmo") == name, F.lit(u)).otherwise(urls)
    return agg.select(
        "id",
        "name",
        "address",
        "location",
        F.concat(*segs).alias("description"),
        F.array_join(phones, "\n").alias("phone_numbers"),
        org.alias("organization"),
        urls.alias("urls"),
    )


def mhc_services(clean: DataFrame, hash_fn: Callable[..., Column] = hasher) -> DataFrame:
    """join_with_self by service name (ref :235-258): branch-id set,
    SITUATIONS expansion, constants, name-keyed id."""
    named = clean.withColumn("svc_name", F.concat(F.lit(SERVICE_NAME_PREFIX), "age_group"))
    sit_map = F.lit(None).cast("array<string>")
    for k, v in SITUATIONS.items():
        sit_map = F.when(F.col("age_group") == k, F.array(*[F.lit(x) for x in v])).otherwise(sit_map)
    named = named.withColumn("age_sits", sit_map)
    agg = named.groupBy("svc_name").agg(
        F.array_sort(F.collect_set("id")).alias("branches"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_set("age_sits")))).alias("age_sits"),
    )
    return agg.select(
        F.concat(F.lit("mhclinic-"), hash_fn(F.col("svc_name"))).alias("id"),
        F.col("svc_name").alias("name"),
        F.col("branches"),
        F.concat(F.array(F.lit(MENTAL_ILLNESS_TAG)), F.col("age_sits")).alias("situations"),
        F.array(*[F.lit(r) for r in RESPONSES]).alias("responses"),
        F.lit(DATA_SOURCE_TEXT).alias("data_sources"),
    )


def sha256_hash_fn(col: Column) -> Column:
    """DuckDB-reproducible id kernel for the registry twins (same
    construction as the reference's sha1[:8], different digest)."""
    return F.substring(F.sha2(col, 256), 1, 8)
