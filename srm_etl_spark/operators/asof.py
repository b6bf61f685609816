"""As-of (temporal) join — an operator the reference lacks entirely (its join
surface is strictly equi-join, SURVEY §2.4), but one any event/fact pipeline
needs: attach to each left row the most recent right row at or before its
timestamp.

Spark has no built-in as-of join, so this is the idiomatic scalable
reformulation: a *union + keyed window* plan rather than a range join —

1. stack left and right rows into one frame tagged by side;
2. one shuffle, partitioned by the join key, sorted by (ts, side);
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding running
   frame carries each right payload forward to the left rows that follow it.

Cost: exactly ONE shuffle of |left| + |right| rows keyed by the join key —
no broadcast requirement on either side, no row explosion, skew handled by
AQE like any other keyed shuffle. This is the plan that survives 100 TB,
unlike a non-equi range join (BroadcastNestedLoop) which needs the right
side to fit in memory.

Determinism: if the right side can hold several rows per (key, ts), callers
must pre-dedup (e.g. ``max_by`` per key+ts) — the reference point for this
contract is DuckDB's ASOF JOIN, which is likewise unspecified under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of left join.

    For every left row, fill ``payload`` columns from the latest right row of
    the same ``on`` key with ``right_ts <= left_ts`` (``<`` when ``strict``).
    Left rows with no prior right row keep NULL payloads (left-join shape).

    ``on`` key column names must match between the two frames (rename first
    if needed); ``payload`` defaults to every right column that is neither a
    key nor the right timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in {*keys, right_ts}]

    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")

    # Right rows sort before left rows at equal ts for inclusive (<=) matches,
    # after them for strict (<) matches.
    right_side = 0 if not strict else 2
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(right_side).alias("_asof_side"),
        *payload,
    )
    l2 = left.select(
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in payload}
    )
    return filled.filter(F.col("_asof_side") == 1).drop("_asof_ts", "_asof_side")
