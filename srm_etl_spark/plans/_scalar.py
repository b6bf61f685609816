"""Driver-gate output contract: registry queries must emit SCALAR columns only.

The external correctness harness canonicalizes query output with
``pandas.sort_values``, which cannot hash list cells — an array-typed column
in a final projection makes the query un-checkable (it errors, it doesn't
mismatch).  Every registry query therefore stringifies array columns in its
final projection, with the SAME encoding on the Spark side and the DuckDB
oracle side so the value hashes stay comparable:

* Spark:  ``coalesce(array_join(col, '|'), '')``
* DuckDB: ``coalesce(array_to_string(col, '|'), '')``

Both engines skip NULL elements inside the list, and both collapse NULL
lists and empty lists to ``''`` (DuckDB's ``array_to_string([])`` returns
NULL — the known empty-list gotcha — hence the coalesce on both sides).

``tests/test_registry_contract.py`` asserts the contract over the whole
registry; ``tools/check_correctness.py`` rejects complex-typed outputs so a
local green run implies a driver-green run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType

SEP = "|"


def stringify_arrays(df: DataFrame, sep: str = SEP) -> DataFrame:
    """Replace every array-typed column with its ``sep``-joined string.

    Element order is preserved (the upstream plans already emit
    deterministic orderings); NULL arrays and empty arrays both become
    ``''``, matching the DuckDB twin produced by :func:`scalarized_sql`.
    """
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, ArrayType):
            cols.append(
                F.coalesce(
                    F.array_join(F.col(field.name).cast("array<string>"), sep),
                    F.lit(""),
                ).alias(field.name)
            )
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def scalarized_sql(sql: str, array_cols: list[str], sep: str = SEP) -> str:
    """Wrap a DuckDB oracle so ``array_cols`` come back ``sep``-joined.

    Uses ``SELECT * REPLACE`` over the original query as a subselect, so
    column order and every scalar column pass through untouched.
    """
    repl = ", ".join(
        f"coalesce(array_to_string({c}, '{sep}'), '') AS {c}" for c in array_cols
    )
    return f"SELECT * REPLACE ({repl}) FROM (\n{sql}\n)"
