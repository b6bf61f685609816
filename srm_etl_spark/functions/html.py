"""HTML sanitization, base64 fallback decode, and the recursive text walk.

Reference behaviors reproduced Spark-native (no bleach/row loops):

- F7  sanitize_html — the reference strips tags with ``bleach.clean(strip=
  True)`` after injecting newlines for block elements (``operators/soproc/
  click_scraper.py:55-68``, ``operators/shil/__init__.py:78-84,100-103``).
  Here: a regexp_replace chain, entirely inside whole-stage codegen.
- F8  base64_or_passthrough — try ascii→base64→utf8, else keep the raw value
  (``operators/soproc/click_scraper.py:58-61``).
- F24 select_text_fields — recursive walk of the row collecting Hebrew
  tokens (``operators/derive/to_es.py:142-160``); here the row is serialized
  once with ``to_json(struct(*))`` and tokenized with one regex pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-level closers that become newlines before tags are stripped.
_BLOCK_BREAKS = r"</p\s*>|</li\s*>|<br\s*/?>|</div\s*>|</h[1-6]\s*>"


def sanitize_html(raw: Column) -> Column:
    """Strip tags, keep text: block closers → newline, tags removed, common
    entities decoded, whitespace collapsed per line."""
    x = F.coalesce(raw, F.lit(""))
    x = F.regexp_replace(x, _BLOCK_BREAKS, "\n")
    x = F.regexp_replace(x, r"<[^>]*>", "")
    for ent, rep in [
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ]:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.regexp_replace(x, r"[ \t]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    # trim() strips only spaces — edge newlines need the regex form
    return F.regexp_replace(x, r"^\s+|\s+$", "")


# A value is treated as base64 only when it is shaped like base64 AND decodes
# to valid UTF-8 (try_ semantics) — otherwise passes through unchanged.
_B64_SHAPE = r"^[A-Za-z0-9+/]+={0,2}$"


def base64_or_passthrough(raw: Column) -> Column:
    """Reference F8: ``v.encode('ascii') → b64decode → utf8`` with the raw
    value kept on any failure. Native: shape check + unbase64 + a UTF-8
    round-trip validity check (decode(encode) == identity)."""
    decoded = F.decode(F.unbase64(raw), "UTF-8")
    looks_b64 = raw.rlike(_B64_SHAPE) & (F.length(raw) % 4 == 0)
    # A bad UTF-8 payload yields replacement chars; reject those.
    clean = ~decoded.contains("�")
    return F.when(looks_b64 & clean, decoded).otherwise(raw)


_HEBREW_TOKEN = r"[֐-׾]+"


def select_text_fields(df: DataFrame, cols: list[str] | None = None) -> Column:
    """F24: every Hebrew token anywhere in the (nested) row, deduped, sorted.

    The reference recursively walks dict/list values; here the row serializes
    to JSON once (nested structs/arrays included) and one regex pass extracts
    the tokens — O(row width) per row, no Python."""
    blob = F.to_json(F.struct(*[F.col(c) for c in (cols or df.columns)]))
    toks = F.regexp_extract_all(blob, F.lit(_HEBREW_TOKEN), F.lit(0))
    return F.array_sort(F.array_distinct(toks))
