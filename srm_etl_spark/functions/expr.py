"""Column-expression utilities shared across kernels."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body) -> Column:
    """Let-binding for column expressions: evaluate `value` ONCE, pass it to
    `body` as a lambda variable.

    ``transform(array(value), v -> body(v))[1]`` — without this, a
    subexpression referenced inside a higher-order lambda is INLINED into the
    lambda body and re-evaluated per element (e.g. a shingle transform that
    re-normalizes + re-splits the whole document for every start index —
    a measured ~100x slowdown on shingling at sf0.1)."""
    return F.element_at(F.transform(F.array(value), body), 1)
