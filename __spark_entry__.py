"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2 + beyond-reference pipeline ops)
to a (spark, sf_dir) callable; ``oracle_sql()`` gives the DuckDB-runnable
equivalent for the correctness gate. Implementations live in the
``logverzcore_spark/suite/`` package (split by family in r6; the flat
namespace is preserved).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logverzcore_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: star-join region revenue at sf0.001."""
    return suite.q04_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(suite.SUITE)


def oracle_sql() -> dict[str, str]:
    return dict(suite.ORACLES)
