"""Query plans: the engine's operator inventory exercised as runnable queries.

``REGISTRY`` maps query name -> QueryDef(spark, oracle, covers). Each Spark
callable takes (spark, sf_dir) and returns a DataFrame; ``oracle`` is the
equivalent ANSI SQL for DuckDB over the same parquet tables (None for ops SQL
can't express, which downgrade to a rows-only check).
"""

from .queries import REGISTRY, QueryDef  # noqa: F401
from .queries_ext import EXT_REGISTRY
from .queries_ext2 import EXT2_REGISTRY
from .queries_ext3 import EXT3_REGISTRY
from .queries_ext4 import EXT4_REGISTRY
from .queries_ext5 import EXT5_REGISTRY
from .queries_ext6 import EXT6_REGISTRY
from .queries_ext7 import EXT7_REGISTRY
from .queries_ext8 import EXT8_REGISTRY
from .queries_ext9 import EXT9_REGISTRY
from .queries_ext10 import EXT10_REGISTRY
from .queries_ext11 import EXT11_REGISTRY
from .queries_ext12 import EXT12_REGISTRY
from .queries_ext13 import EXT13_REGISTRY
from .queries_ext14 import EXT14_REGISTRY
from .queries_ext15 import EXT15_REGISTRY
from .queries_ext16 import EXT16_REGISTRY

REGISTRY.update(EXT_REGISTRY)
REGISTRY.update(EXT2_REGISTRY)
REGISTRY.update(EXT3_REGISTRY)
REGISTRY.update(EXT4_REGISTRY)
REGISTRY.update(EXT5_REGISTRY)
REGISTRY.update(EXT6_REGISTRY)
REGISTRY.update(EXT7_REGISTRY)
REGISTRY.update(EXT8_REGISTRY)
REGISTRY.update(EXT9_REGISTRY)
REGISTRY.update(EXT10_REGISTRY)
REGISTRY.update(EXT11_REGISTRY)
REGISTRY.update(EXT12_REGISTRY)
REGISTRY.update(EXT13_REGISTRY)
REGISTRY.update(EXT14_REGISTRY)
REGISTRY.update(EXT15_REGISTRY)
REGISTRY.update(EXT16_REGISTRY)

# Driver-window rotation: the driver's correctness gate only verifies the
# FIRST 50 registry entries (q51+ get the committed local full run). Rotate
# the round-5 ingestion verticals (the newest, heaviest composed queries)
# into that window so the independent gate covers them — the displaced
# entries keep their local verification.
_ROTATED = list(EXT13_REGISTRY) + list(EXT14_REGISTRY) + list(EXT15_REGISTRY)
_head = [n for n in REGISTRY if n not in _ROTATED][: 50 - len(_ROTATED)]
_ordered = (
    {n: REGISTRY[n] for n in _head}
    | {n: REGISTRY[n] for n in _ROTATED}
    | {n: REGISTRY[n] for n in REGISTRY if n not in _head and n not in _ROTATED}
)
REGISTRY.clear()
REGISTRY.update(_ordered)
