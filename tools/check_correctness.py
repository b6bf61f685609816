"""Local twin of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` at sf0.01 (or $SPARK_GRAFT_SF_DIR)
and compares to ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified form). Prints one line per query; exits non-zero on any mismatch.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v) -> str:
    import datetime  # noqa: PLC0415
    import math  # noqa: PLC0415

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: well past the rounding every query applies,
        # short of representation noise.
        return f"{v:.12g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict)):
        # The DRIVER's canonicalizer (pandas.sort_values) cannot hash list
        # cells — a complex-typed output errs at the external gate even when
        # values match. Mirror that here instead of stringifying, so local
        # green implies driver green.
        raise ComplexCellError(type(v).__name__)
    return str(v)


class ComplexCellError(TypeError):
    """A result cell is list/map/struct-typed — un-checkable at the driver gate."""


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha1()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as entrymod  # noqa: PLC0415
    from srm_etl_spark.session import get_spark  # noqa: PLC0415

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from srm_etl_spark.operators.session_cache import release_all  # noqa: PLC0415

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # start each query cold (see bench.py) — also bounds peak storage
        # memory across the 168-query single-session run
        release_all(spark)
        try:
            sdf = fn(spark, sf_dir)
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                print(
                    f"{name}: COMPLEX-TYPE cols={complex_cols} "
                    "(driver canonicalizer cannot hash these — stringify in the projection)"
                )
                failures += 1
                continue
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: SPARK-ERROR {type(ex).__name__}: {str(ex).splitlines()[0][:160]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only rows={len(srows)} cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ORACLE-ERROR {type(ex).__name__}: {str(ex).splitlines()[0][:160]}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            try:
                sh, oh = _hash_rows(scols, srows), _hash_rows(ocols, orows)
            except ComplexCellError as ex:
                print(f"{name}: COMPLEX-TYPE oracle cells ({ex}) — scalarize the oracle SQL too")
                failures += 1
                continue
            if sh != oh:
                problems.append(f"valuehash spark={sh} oracle={oh}")
                # show a few differing rows for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {"|".join(_norm_cell(r[i]) for i in order_s) for r in srows}
                oset = {"|".join(_norm_cell(r[i]) for i in order_o) for r in orows}
                for line in list(sset - oset)[:3]:
                    print(f"    spark-only: {line[:200]}")
                for line in list(oset - sset)[:3]:
                    print(f"    oracle-only: {line[:200]}")
        if problems:
            print(f"{name}: MISMATCH {'; '.join(problems)}")
            failures += 1
        else:
            print(f"{name}: MATCH rows={len(srows)}")
    print(f"\n{'FAIL' if failures else 'OK'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
