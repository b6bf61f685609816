"""Fuzzy substring location: address_parts (F5) and org_name_parts (F6).

The reference finds a known city (or short org name) INSIDE a free-text
address/name using the ``regex`` module's error-tolerant match ``(?:...){e<2}``
(``operators/derive/helpers.py:314-375``) — i.e. the needle may appear with
at most one edit. No native Spark expression can do bounded-error substring
search, so this is one of the few justified Python kernels (SURVEY §7.2
watch-list #5): an Arrow-batched pandas UDF over a banded Levenshtein scan.

Scale shape: pure map over rows — no shuffle, no state; Arrow batches bound
memory; cost is O(|hay|·|needle|) per row with tiny constants (needles are
city names, < 30 chars).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _edits_leq1(a: str, b: str) -> bool:
    """Levenshtein(a, b) <= 1, O(len) two-pointer check."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    used = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
            continue
        if used:
            return False
        used = True
        if la == lb:
            i += 1
            j += 1
        else:
            j += 1  # skip the extra char in the longer string
    return True


def fuzzy_find(hay: str, needle: str) -> int:
    """Leftmost index where ``needle`` occurs in ``hay`` with <= 1 edit
    (reference ``{e<2}``); -1 when absent. Exact match wins first."""
    if not hay or not needle:
        return -1
    exact = hay.find(needle)
    if exact >= 0:
        return exact
    n = len(needle)
    for start in range(len(hay)):
        for ln in (n, n - 1, n + 1):
            if ln <= 0 or start + ln > len(hay):
                continue
            if _edits_leq1(hay[start : start + ln], needle):
                return start
    return -1


_PARTS_SCHEMA = StructType(
    [
        StructField("primary", StringType()),
        StructField("secondary", StringType()),
        StructField("match_start", IntegerType()),
    ]
)


def _split_parts(hay: pd.Series, needle: pd.Series) -> pd.DataFrame:
    prim, sec, idx = [], [], []
    for h, c in zip(hay, needle):
        h = h or ""
        i = fuzzy_find(h, c or "")
        if i < 0:
            prim.append(h.strip(" ,-") or None)
            sec.append(None)
            idx.append(-1)
        else:
            prim.append(h[:i].strip(" ,-") or None)
            sec.append(h[i:].strip(" ,-") or None)
            idx.append(i)
    return pd.DataFrame({"primary": prim, "secondary": sec, "match_start": idx})


_split_parts_udf = F.pandas_udf(_split_parts, _PARTS_SCHEMA)


def address_parts(address: Column, city: Column) -> Column:
    """F5: split the address around the (fuzzily located) city.

    Returns struct(primary, secondary, match_start): primary = the street
    part before the city, secondary = the city-and-after part, match_start =
    character index of the match (-1 → city absent, address stays primary,
    the reference's "inaccurate" annotation)."""
    return _split_parts_udf(address, city)


def org_name_parts(name: Column, short_name: Column) -> Column:
    """F6: same technique, locating the short org name inside the full name."""
    return _split_parts_udf(name, short_name)
