"""Round-7 extension queries: the curator ManualFixes applier
(reference operators/derive/manual_fixes.py:65-152, the mechanism
from_curation composes at :91-178 that q135 did not cover).

q140 — the conditional field rewrite: current_value guard (incl. the '*'
       wildcard), normalize_ids comma-set-sort for responses/situations,
       and in-order chained application per row.
q141 — the etl_status write-back table: every referenced fix, Active when
       it applied to ≥1 row anywhere, else Obsolete (finalize, :137-152).

Both oracles mirror the MF_FIXES literal table + the mf_rows fixture
arithmetic in closed form (the q108/q138 no-drift discipline).
"""

from __future__ import annotations

from ..pipelines import manual_fixes as MF
from .queries import QueryDef


def q140_manual_fixes(spark, sf_dir):
    """ManualFixes row rewrite: broadcast fixes dimension, posexplode →
    ordered chain re-collect, native F.aggregate fold per field (wildcard,
    null-safe guard, tag normalization, chained fixes in row order)."""
    rows, _ = MF.run_manual_fixes(spark, sf_dir)
    return rows.select("id", "name", "description", "responses", "situations")


def q141_manual_fix_status(spark, sf_dir):
    """ManualFixes etl_status side table (K4-shape write-back): referenced
    fixes marked Active iff they applied somewhere, else Obsolete."""
    _, status = MF.run_manual_fixes(spark, sf_dir)
    return status


def _q140_sql() -> str:
    k = "p_partkey"
    star_name = dict((f[0], f[3]) for f in MF.MF_FIXES)["fx-name-star"]
    return f"""
SELECT 'sv-' || CAST({k} AS VARCHAR) AS id,
       CASE WHEN {k} % 7 = 1 THEN '{star_name}'
            ELSE 'שירות ' || CAST({k} AS VARCHAR) END AS name,
       CASE WHEN {k} % 7 = 0 AND {k} % 4 = 1 THEN 'D9'
            WHEN {k} % 7 = 3 AND {k} % 4 = 3 THEN 'D-final'
            WHEN {k} % 7 = 4 AND {k} % 4 = 3 THEN 'D-mid'
            ELSE 'D' || CAST({k} % 4 AS VARCHAR) END AS description,
       CASE WHEN {k} % 7 = 2 AND {k} % 3 = 0 THEN 'r-a,r-c'
            WHEN {k} % 3 = 0 THEN 'r-a,r-b'
            ELSE 'r-a' END AS responses,
       CASE WHEN {k} % 7 = 2 THEN 's-a,s-z'
            ELSE 's-' || CAST({k} % 3 AS VARCHAR) || ',s-m' END AS situations
FROM part
"""


def _q141_sql() -> str:
    k = "p_partkey"

    def fix_row(fix_id: str, used_cond: str, active_cond: str) -> str:
        return (
            f"SELECT '{fix_id}' AS fix_id, "
            f"CASE WHEN EXISTS(SELECT 1 FROM part WHERE {active_cond}) "
            f"THEN 'Active' ELSE 'Obsolete' END AS etl_status "
            f"WHERE EXISTS(SELECT 1 FROM part WHERE {used_cond})"
        )

    rows = [
        fix_row("fx-desc", f"{k} % 7 = 0", f"{k} % 7 = 0 AND {k} % 4 = 1"),
        fix_row("fx-name-star", f"{k} % 7 = 1", f"{k} % 7 = 1"),
        fix_row("fx-resp", f"{k} % 7 = 2", f"{k} % 7 = 2 AND {k} % 3 = 0"),
        fix_row("fx-sit", f"{k} % 7 = 2", f"{k} % 7 = 2"),
        fix_row(
            "fx-chain1",
            f"{k} % 7 IN (3, 4)",
            f"{k} % 7 IN (3, 4) AND {k} % 4 = 3",
        ),
        fix_row("fx-chain2", f"{k} % 7 IN (3, 4)", f"{k} % 7 = 3 AND {k} % 4 = 3"),
        fix_row("fx-obsolete", f"{k} % 7 = 5", "1 = 0"),
    ]
    return "\nUNION ALL\n".join(rows)


EXT17_REGISTRY = {
    "q140_manual_fixes": QueryDef(
        q140_manual_fixes,
        _q140_sql(),
        "ManualFixes conditional rewrite (wildcard, normalize_ids, chained)",
    ),
    "q141_manual_fix_status": QueryDef(
        q141_manual_fix_status,
        _q141_sql(),
        "ManualFixes etl_status Active/Obsolete write-back",
    ),
}
