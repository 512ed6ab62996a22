"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship aggregate at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator registry from
``jp_qcew_spark.queries`` (one entry per implemented operator from
SURVEY.md §2, alias-disciplined to hash-match the DuckDB oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jp_qcew_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from jp_qcew_spark.queries.core import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omissions = rows-only)."""
    return all_oracles()
