"""Writers: Parquet (canonical IR), GeoJSON, sitemap, Elasticsearch protocol,
JDBC. External services are behind pure generate-then-ship seams so the
distributed part (document/action generation) is testable without a server."""

from .es import es_mapping, revision_sweep_body, to_es_actions  # noqa: F401
from .files import write_geojson, write_parquet_stage, write_sitemaps  # noqa: F401
