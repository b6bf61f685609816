"""Round-4 extension queries, part 4: the observability layer.

q89 — one-pass table profile (operators/profiling.py:profile_table) — the
      Deequ-shaped per-column summary a pipeline gate reads before
      promoting a new snapshot.
q90 — population-stability-index drift between two corpus slices
      (operators/profiling.py:psi) — the "did the distribution move"
      monitor, on the engine's quality score.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..operators.profiling import profile_table, psi
from .queries import QueryDef, _t


# --------------------------------------------------------------------------
# q89 — one-pass table profile
# --------------------------------------------------------------------------

def q89_profile(spark, sf_dir):
    """Profile of the documents table: per column its null count, exact
    distinct count and native-order min/max — computed in ONE aggregate
    pass and unpivoted with stack, so the scan cost is a single read
    however many columns are profiled."""
    d = _t(spark, sf_dir, "documents")
    return profile_table(d, ["doc_id", "text", "lang", "source", "n_chars"])


_PROF_COL = """
SELECT '{c}' AS col_name,
       CAST(n.n_rows AS BIGINT) AS n_rows,
       CAST(n.n_rows - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM documents, (SELECT count(*) AS n_rows FROM documents) n
GROUP BY n.n_rows
"""

Q89_SQL = " UNION ALL ".join(
    _PROF_COL.format(c=c) for c in ["doc_id", "text", "lang", "source", "n_chars"]
)


# --------------------------------------------------------------------------
# q90 — quality-score drift (PSI) between corpus halves
# --------------------------------------------------------------------------

def q90_quality_drift(spark, sf_dir):
    """PSI of the quality-score distribution between the even- and odd-id
    halves of the corpus: closed-form binning (floor over a fixed range) so
    both engines bin identically, fractions floored at 1e-6 so empty bins
    contribute finitely. Two small hash aggregates + a 5-row join."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", quality_score(F.col("text")).alias("q")
    )
    out = psi(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        "q",
        lo=0.0,
        hi=1.0,
        bins=5,
    )
    return out.select(
        F.col("bin").cast("long").alias("bin"),
        F.round("expected_frac", 6).alias("expected_frac"),
        F.round("actual_frac", 6).alias("actual_frac"),
        F.round("psi_term", 8).alias("psi_term"),
    )


_QUALITY_SQL = """
  SELECT doc_id,
    round((
      least(CAST(len(toks) AS DOUBLE) / 50, 1.0)
      + 1.0 - least(CASE WHEN nonspace = 0 THEN 0.0
                         ELSE CAST(n_punct AS DOUBLE) / nonspace END * 4, 1.0)
      + CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CASE WHEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)
                            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END END
    ) / 3.0, 4) AS q
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks,
           length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
           length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS n_punct
    FROM documents
  )
"""

Q90_SQL = f"""
WITH scored AS ({_QUALITY_SQL}),
binned AS (
  SELECT doc_id % 2 AS side,
         CAST(least(greatest(floor(q / CAST(0.2 AS DOUBLE)), 0), 4) AS BIGINT) AS bin
  FROM scored
),
tot AS (SELECT side, CAST(count(*) AS DOUBLE) AS n FROM binned GROUP BY side),
fr AS (
  SELECT b.side, b.bin, count(*) / t.n AS frac
  FROM binned b JOIN tot t USING (side) GROUP BY b.side, b.bin, t.n
),
bins AS (SELECT unnest(range(5)) AS bin),
j AS (
  SELECT bins.bin,
         coalesce(e.frac, 0.0) AS expected_frac,
         coalesce(a.frac, 0.0) AS actual_frac
  FROM bins
  LEFT JOIN (SELECT bin, frac FROM fr WHERE side = 0) e USING (bin)
  LEFT JOIN (SELECT bin, frac FROM fr WHERE side = 1) a USING (bin)
)
SELECT CAST(bin AS BIGINT) AS bin,
       round(expected_frac, 6) AS expected_frac,
       round(actual_frac, 6) AS actual_frac,
       round((greatest(actual_frac, 1e-6) - greatest(expected_frac, 1e-6))
             * ln(greatest(actual_frac, 1e-6) / greatest(expected_frac, 1e-6)), 8) AS psi_term
FROM j
"""


EXT9_REGISTRY = {
    "q89_profile": QueryDef(
        q89_profile, Q89_SQL, "LLM-pipeline: one-pass table profiling (A9-ext)"
    ),
    "q90_quality_drift": QueryDef(
        q90_quality_drift, Q90_SQL, "LLM-pipeline: PSI distribution drift (P7-ext)"
    ),
}
