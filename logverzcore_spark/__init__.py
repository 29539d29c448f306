"""logverzcore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of logleads/LogverzCore.

The reference (studied at /root/reference, see SURVEY.md) is a serverless
S3-log ELT + SQL analytics platform. This package re-expresses its
capabilities Spark-first:

- ``schemas``    — the DataType schema registry (SURVEY §1.1-1.3)
- ``sources``    — batch readers for the reference's file formats (§2.1)
- ``operators``  — coercion, operator-tree queries, dedup/similarity/
                   text/multimodal/event analytics (§2.2-2.8 + pipeline ops)
- ``plans``      — SQL validation (SELECT-only gate, legacy dialect shim)
                   (§2.3 Q2, P2)
- ``ingest``     — batch collection jobs (§3.1)
- ``streaming``  — continuous collection + windowed/stateful streaming (§3.2)
- ``api``        — the interactive query surface (Engine facade, §3.3)
- ``catalog``    — dataset/saved-query metadata + ACLs (§1.4)
- ``registry``   — multi-target database registry (§1.4)
"""

from logverzcore_spark.api import ADMIN, Engine
from logverzcore_spark.catalog import Catalog, CatalogEntry, User
from logverzcore_spark.engine import get_session, load_sf_tables
from logverzcore_spark.ingest import CollectJob, CollectReport, collect
from logverzcore_spark.registry import DatabaseRegistry

__all__ = [
    "ADMIN",
    "Catalog",
    "CatalogEntry",
    "CollectJob",
    "CollectReport",
    "DatabaseRegistry",
    "Engine",
    "User",
    "collect",
    "get_session",
    "load_sf_tables",
]
