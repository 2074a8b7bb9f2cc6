"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship breakdown query (SURVEY.md §3.2) on
sf0.001.  ``queries()`` / ``oracle_sql()`` expose the t2 registry from
``timesearch_spark.queries`` — one entry per implemented operator from
SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timesearch_spark import queries as tsq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (D1 breakdown + F4 sort) on /root/testdata/sf0.001."""
    return tsq.sort_computed_key(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(tsq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(tsq.ORACLE)
