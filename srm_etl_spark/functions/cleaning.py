"""String-cleaning kernels (phones, URLs, org names, whitespace, slugs).

Re-expressions of the reference's row lambdas as native Spark column
expressions — the hot path stays JVM-side / codegen'd. References:

- phone formatting   ``operators/derive/helpers.py:32-54``
- url lines          ``operators/derive/helpers.py:23-29``
- org-name cleanup   ``srm_tools/data_cleaning.py:5-24``
- whitespace         ``operators/derive/helpers.py:377-388``
- fix_url            ``srm_tools/url_utils.py:5-12``
- slug/id validation ``operators/manual_data_entry/mde_utils.py:19-27``,
                     ``operators/derive/autocomplete.py:40-42``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _format_il_phone(number: Column) -> Column:
    """One phone entry -> Israeli display format, else the trimmed original.

    Semantics: strip non-digits; drop a leading 972 country code (restoring a
    leading 0 when that leaves 9 digits); then group 9-digit 0x-xxx-xxxx /
    10-digit 0xx-xxx-xxxx / 10-digit 1-xxx-xxxxxx; anything else keeps the
    original trimmed text.
    """
    trimmed = F.trim(number)
    digits0 = F.regexp_replace(trimmed, r"\D", "")
    intl = (F.length(digits0) > 10) & digits0.startswith("972")
    stripped = F.substring(digits0, 4, 32)
    restored = F.when(
        intl & (F.length(stripped) < 10) & ~stripped.startswith("0"),
        F.concat(F.lit("0"), stripped),
    ).otherwise(F.when(intl, stripped).otherwise(digits0))
    d = restored
    grouped = (
        F.when(
            (F.length(d) == 9) & d.startswith("0"),
            F.concat_ws("-", F.substring(d, 1, 2), F.substring(d, 3, 3), F.substring(d, 6, 4)),
        )
        .when(
            (F.length(d) == 10) & d.startswith("0"),
            F.concat_ws("-", F.substring(d, 1, 3), F.substring(d, 4, 3), F.substring(d, 7, 4)),
        )
        .when(
            (F.length(d) == 10) & d.startswith("1"),
            F.concat_ws("-", F.substring(d, 1, 1), F.substring(d, 2, 3), F.substring(d, 5, 6)),
        )
        .otherwise(trimmed)
    )
    return grouped


def transform_phone_numbers(raw: Column) -> Column:
    """Newline-separated phone text -> array of formatted numbers.

    Empty entries are dropped; null input -> empty array (reference returns
    ``[]`` for falsy input).
    """
    entries = F.split(F.coalesce(raw, F.lit("")), "\n")
    formatted = F.transform(entries, _format_il_phone)
    return F.filter(formatted, lambda x: x != "")


def transform_urls(raw: Column, default_title: str = "קישור") -> Column:
    """``href#title`` lines -> ``array<struct<href,title>>`` with default title.

    The reference rsplits on the LAST ``#``; null input stays null.
    """

    def to_struct(s: Column) -> Column:
        has_title = F.size(F.split(s, "#")) > 1
        href = F.when(
            has_title, F.regexp_replace(s, r"#[^#]*$", "")
        ).otherwise(s)
        title = F.when(has_title, F.regexp_extract(s, r"#([^#]*)$", 1)).otherwise(
            F.lit(default_title)
        )
        title = F.when(title == "", F.lit(default_title)).otherwise(title)
        return F.struct(href.alias("href"), title.alias("title"))

    return F.when(raw.isNotNull() & (raw != ""), F.transform(F.split(raw, "\n"), to_struct))


# Exact reference order — 'ע"' is stripped BEFORE 'ע"ר', so the latter only
# ever matches after an intervening edge-strip changed the ending.
_ORG_SUFFIXES = ["בעמ", "בע״מ", "בע'מ", "ע״ר", "חל״צ", 'ע"', 'ע"ר', "()"]
_ORG_STOPWORDS = ["עמותת ", "העמותה ל"]


def clean_org_name(name: Column) -> Column:
    """Strip legal suffixes (בע״מ, ע״ר, ...), stopwords and edge punctuation."""
    out = F.coalesce(name, F.lit(""))
    for suffix in _ORG_SUFFIXES:
        out = F.replace(out, F.lit(suffix), F.lit(""))
        out = F.regexp_replace(out, r"^[,.()\s]+|[,.()\s]+$", "")
    for word in _ORG_STOPWORDS:
        out = F.replace(out, F.lit(word), F.lit(""))
    return F.regexp_replace(out, r"^[ \-,\n\t]+|[ \-,\n\t]+$", "")


def remove_whitespaces(value: Column) -> Column:
    """Collapse runs of whitespace to one space; trim `` \\t(\\n-`` edges."""
    collapsed = F.regexp_replace(value, r"\s+", " ")
    return F.regexp_replace(collapsed, r"^[ \t(\n\-]+|[ \t(\n\-]+$", "")


_GOOD_DOMAIN = r"^[a-zA-Z0-9][a-zA-Z0-9\-\.]{0,61}[a-zA-Z0-9]\.[a-zA-Z]{2,}$"


def fix_url(url: Column) -> Column:
    """Pass http(s) URLs through; prefix bare valid domains; else null."""
    return (
        F.when(url.startswith("http"), url)
        .when(url.rlike(_GOOD_DOMAIN), F.concat(F.lit("http://"), url))
        .otherwise(F.lit(None).cast("string"))
    )


def slugify(value: Column) -> Column:
    """Lowercase, non-alphanumeric runs -> ``-``, trimmed of leading/trailing ``-``."""
    lowered = F.lower(F.trim(value))
    dashed = F.regexp_replace(lowered, r"[^a-z0-9֐-׿]+", "-")
    return F.regexp_replace(dashed, r"^-+|-+$", "")
