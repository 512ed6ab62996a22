"""Dataset loaders for the driver-provided oracle tables (TESTDATA.md).

Every query entry loads through here so scans stay uniform: parquet, lazy,
column pruning and predicate pushdown left to Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one oracle table. ``sf_dir`` is e.g. /root/testdata/sf0.01."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
