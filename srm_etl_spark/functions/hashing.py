"""Deterministic short-id hashing with exact reference semantics.

The reference derives every stable id (cards, synthesized branches, manual
entries) from ``sha1(''.join(filter(None, args)))[:8]``
(reference ``srm_tools/hash.py:4-6``). Ids must match byte-for-byte so golden
outputs and cross-run diffs stay stable, hence:

- null/None and empty-string arguments contribute nothing (``filter(None)``),
- there is NO separator between arguments,
- UTF-8 encoding, lowercase hex, first 8 chars.

``concat_ws('', ...)`` skips NULLs and empty strings contribute zero bytes, so
the native expression is byte-identical to the reference — all JVM-side, no
UDF, whole-stage-codegen friendly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def hasher(*cols: Column | str) -> Column:
    """sha1-based 8-char surrogate id over the non-null args, no separator."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.substring(F.sha1(F.concat_ws("", *cols)), 1, 8)


def hasher_py(*args: str | None) -> str:
    """Driver-side twin of :func:`hasher` for tests and literals."""
    return hashlib.sha1("".join(filter(None, args)).encode("utf-8")).hexdigest()[:8]


def hash_row(table_fields: list[str], extra_fields: tuple[str, ...] = ("source", "status")) -> Column:
    """Change-detection hash for upsert write-amplification control.

    The reference joins the stringified values of the tracked fields plus
    ``source``/``status`` with ``###`` and strips all whitespace
    (reference ``srm_tools/update_table.py:28-32``); rows whose hash is
    unchanged are skipped on write. Reproduced as a native expression:
    stringify each column, join with ``###``, erase whitespace, sha1.
    (We hash the normalized string rather than keeping it verbatim — only
    equality matters.)
    """
    parts = [F.coalesce(F.col(f).cast("string"), F.lit("None")) for f in list(table_fields) + list(extra_fields)]
    joined = F.concat_ws("###", *parts)
    normalized = F.regexp_replace(joined, r"[\n\t ]", "")
    return F.sha1(normalized)
