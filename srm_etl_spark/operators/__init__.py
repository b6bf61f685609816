from . import dedup, relational, similarity, stats, upsert, windows  # noqa: F401
