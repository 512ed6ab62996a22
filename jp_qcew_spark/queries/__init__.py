"""Driver-facing query registry.

Aggregates every query group into two dicts consumed by ``__spark_entry__``:

- ``all_queries()``  : name -> callable(spark, sf_dir) -> DataFrame
- ``all_oracles()``  : name -> equivalent DuckDB SQL (omitted for ops that are
  genuinely not SQL-expressible; the driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_GROUPS = [
    "jp_qcew_spark.queries.core",
    "jp_qcew_spark.queries.joins",
    "jp_qcew_spark.queries.windows",
    "jp_qcew_spark.queries.events",
    "jp_qcew_spark.queries.setops",
    "jp_qcew_spark.queries.text",
    "jp_qcew_spark.queries.dedup",
    "jp_qcew_spark.queries.similarity",
    "jp_qcew_spark.queries.streaming",
    "jp_qcew_spark.queries.multimodal",
    "jp_qcew_spark.queries.sketches",
    "jp_qcew_spark.queries.geo",
    "jp_qcew_spark.queries.graph",
    "jp_qcew_spark.queries.scalars",
    "jp_qcew_spark.queries.llm_prep",
    "jp_qcew_spark.queries.wages_ts",
    "jp_qcew_spark.queries.training",
    "jp_qcew_spark.queries.warehouse",
    "jp_qcew_spark.queries.curation",
]


def _load():
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod_name in _GROUPS:
        try:
            mod = import_module(mod_name)
        except ModuleNotFoundError:
            continue  # group not built yet
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod_name}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLE", {}).items():
            oracles[name] = sql
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
