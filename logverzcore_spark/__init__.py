"""logverzcore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of logleads/LogverzCore.

The reference (studied at /root/reference, see SURVEY.md) is a serverless
S3-log ELT + SQL analytics platform. This package re-expresses its
capabilities Spark-first:

- ``registry``   — the DataType schema registry (SURVEY §1.1-1.3)
- ``sources``    — batch readers for the reference's file formats (§2.1)
- ``operators``  — coercion, operator-tree queries, dedup/similarity/text (§2.2-2.8)
- ``plans``      — SQL validation (SELECT-only gate, legacy dialect shim) (§2.3 Q2, P2)
- ``collect``    — batch collection jobs (§3.1)
- ``streaming``  — continuous collection via Structured Streaming (§3.2)
- ``query``      — the interactive query surface (§3.3)
- ``catalog``    — dataset/saved-query metadata + ACLs (§1.4)
"""

from logverzcore_spark.engine import get_session, load_sf_tables

__all__ = ["get_session", "load_sf_tables"]
