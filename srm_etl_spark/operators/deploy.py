"""Deploy: spec-driven table sync between Airtable bases, Spark-first.

Reference ``operators/deploy/__init__.py:13-86``: for each ``DeploySpec``
(table, id field, copy fields, add_missing) the alternate base's rows are
indexed by id and streamed against the production table —

- a target row whose id exists in the source is emitted ONLY when at least
  one copy field differs (updated with the source values): unchanged rows
  produce no write;
- target rows absent from the source are never emitted;
- when ``add_missing``, source rows with no target match are appended;
- a copy field ``'src:dst'`` renames after the update.

Spark shape: one full-outer-flavored pair of joins expressed as
left-semi/anti + a broadcast of the (dimension-sized) source. Change
detection is a null-safe any-differs disjunction — no row hashing, no
Python. The reference's ``source_index.pop`` mutation becomes the anti-join
for the add_missing leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deploy_table(
    target: DataFrame,
    source: DataFrame,
    id_col: str,
    copy_fields: list[str],
    add_missing: bool = False,
) -> DataFrame:
    """The dump payload of one DeploySpec (update_from_source,
    deploy/__init__.py:38-49). ``copy_fields`` may use the reference's
    ``'src:dst'`` rename form; output columns are ``id_col`` + the renamed
    copy fields."""
    select_fields = [f.split(":")[0] for f in copy_fields]
    rename = dict(f.split(":") for f in copy_fields if ":" in f)

    src = source.select(
        F.col(id_col).alias("_sid"), *[F.col(c).alias(f"_s_{c}") for c in select_fields]
    )
    joined = target.select(id_col, *select_fields).join(
        F.broadcast(src), F.col(id_col) == F.col("_sid"), "inner"
    )
    differs = None
    for c in select_fields:
        d = ~F.col(c).eqNullSafe(F.col(f"_s_{c}"))
        differs = d if differs is None else (differs | d)
    updated = joined.filter(differs).select(
        F.col(id_col), *[F.col(f"_s_{c}").alias(c) for c in select_fields]
    )
    out = updated
    if add_missing:
        missing = source.join(
            target.select(F.col(id_col).alias("_tid")),
            F.col(id_col) == F.col("_tid"),
            "left_anti",
        ).select(id_col, *select_fields)
        out = updated.unionByName(missing)
    for s, d in rename.items():
        out = out.withColumnRenamed(s, d)
    return out
