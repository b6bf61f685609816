"""JDBC sink with secondary-index DDL (reference K2: to_sql.py:26-45 —
dump_to_sql creates/replaces the table and adds six single-column indexes).

Spark's ``df.write.jdbc`` handles the create/replace; index creation is a
post-write DDL pass executed through a caller-supplied statement runner
(injectable so tests verify the DDL without a database, and production
passes a real cursor/connection executor).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def index_ddl(table: str, indexed_fields: list[str]) -> list[str]:
    """One ``CREATE INDEX`` per field, reference naming scheme."""
    return [
        f'CREATE INDEX IF NOT EXISTS "idx_{table}_{f}" ON "{table}" ("{f}")'
        for f in indexed_fields
    ]


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    indexed_fields: list[str] | None = None,
    mode: str = "overwrite",
    execute_ddl: Callable[[str], None] | None = None,
    **options: str,
) -> list[str]:
    """Write ``df`` and (optionally) create secondary indexes.

    Returns the DDL statements (executed when ``execute_ddl`` is given) so
    callers/tests can inspect exactly what would run.
    """
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
    ddl = index_ddl(table, indexed_fields or [])
    if execute_ddl is not None:
        for stmt in ddl:
            execute_ddl(stmt)
    return ddl
