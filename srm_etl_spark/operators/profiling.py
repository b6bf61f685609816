"""Data profiling + distribution drift — the observability layer of a
training-data pipeline (Deequ/Great-Expectations-shaped, built on the same
Stats/Report philosophy as the reference's ``srm_tools/stats.py``: quality
signals are first-class query outputs, not log lines).

Scale shapes:
- :func:`profile_table` is ONE aggregate pass over the table (per-column
  count/distinct/min/max computed side by side, then unpivoted with
  ``stack``) — the scan cost is a single read regardless of column count.
  Exact distinct counts shuffle per column; pass ``approx=True`` to use
  HLL++ (``approx_count_distinct``) and keep the whole profile map-side
  combinable at 100 TB.
- :func:`psi` bins both slices with the same closed-form bin expression
  (floor over a fixed range — no per-engine histogram boundaries), so the
  comparison is two small hash aggregates plus a 5-row join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max taken in the column's native order and
    cast to string for a uniform schema."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    distinct = (
        (lambda c: F.approx_count_distinct(F.col(c)))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    # positional aliases: the stack() SQL references them, so column names
    # with spaces/quotes/hyphens must never leak into identifiers
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"_nonnull_{i}"),
            distinct(c).alias(f"_nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{i}"),
        ]
    one = df.agg(*aggs)
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(
            "'{label}', _nonnull_{i}, _nd_{i}, _min_{i}, _max_{i}".format(
                label=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
            )
            for i, c in enumerate(cols)
        )
        + ") AS (col_name, _nonnull, n_distinct, min_value, max_value)"
    )
    return one.select(F.col("_n_rows").alias("n_rows"), F.expr(stack)).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("_nonnull")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def psi(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 5,
    eps: float = 1e-6,
) -> DataFrame:
    """Population stability index between two slices of a bounded metric.

    Values are binned by ``floor((x - lo) / (hi - lo) * bins)`` clamped to
    [0, bins-1] — a closed-form assignment any engine reproduces exactly.
    Output: one row per bin with both fractions and the PSI term
    ``(p_a - p_e) * ln(p_a / p_e)`` (fractions floored at ``eps`` so empty
    bins contribute finitely). Sum of psi_term is the classic drift score
    (<0.1 stable, >0.25 shifted).
    """
    if bins <= 0 or hi <= lo:
        raise ValueError("need bins > 0 and hi > lo")
    width = (hi - lo) / bins

    def frac(df: DataFrame, name: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
            ),
            F.lit(bins - 1),
        ).cast("long")
        # NULL metric values carry no distribution information: excluded from
        # both the bins and the normalizing total (a null bin row would be
        # dropped by the all_bins join but still deflate every fraction)
        counts = (
            df.filter(F.col(value_col).isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # normalize over the (<= bins)-row aggregate with a global window —
        # one pass over the slice, no driver-side count action
        from pyspark.sql import Window  # noqa: PLC0415

        total = F.sum("_c").over(Window.partitionBy())
        return counts.select(
            "bin", (F.col("_c") / total.cast("double")).alias(name)
        )

    all_bins = expected.sparkSession.range(bins).select(F.col("id").alias("bin"))
    e = frac(expected, "expected_frac")
    a = frac(actual, "actual_frac")
    joined = (
        all_bins.join(e, "bin", "left")
        .join(a, "bin", "left")
        .select(
            "bin",
            F.coalesce("expected_frac", F.lit(0.0)).alias("expected_frac"),
            F.coalesce("actual_frac", F.lit(0.0)).alias("actual_frac"),
        )
    )
    pe = F.greatest(F.col("expected_frac"), F.lit(eps))
    pa = F.greatest(F.col("actual_frac"), F.lit(eps))
    return joined.withColumn("psi_term", (pa - pe) * F.log(pa / pe))
