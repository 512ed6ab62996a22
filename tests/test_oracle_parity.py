"""Every queries() entry must match its oracle_sql() on DuckDB — the local
pre-check for the driver's CORRECTNESS gate (sf0.001 for speed; the driver
runs sf0.01)."""

from __future__ import annotations

import pytest

from jp_qcew_spark.queries import all_oracles, all_queries
from tests.harness import compare, duckdb_conn

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_registry_nonempty():
    assert QUERIES, "query registry is empty"
    # oracle-less (rows-only) entries are allowed but should be rare
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    assert len(rows_only) <= max(3, len(QUERIES) // 4), rows_only


def test_driver_window_is_the_priority_list():
    """The driver snapshots the FIRST 50 registry entries; the rotation in
    ``_WINDOW_PRIORITY`` is evidence policy (VERDICT r2 #1) and must be
    exactly what the driver sees — a new query registered in an
    early-loading module must never silently evict a window entry again."""
    from jp_qcew_spark.queries import _WINDOW_PRIORITY

    assert len(_WINDOW_PRIORITY) == 50
    assert list(QUERIES)[:50] == _WINDOW_PRIORITY


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    # r2 rule: no array/map/struct in a final projection — the driver's
    # pandas canonicalizer can't hash them (text_inverted_index was the one
    # red r2 row for exactly this; VERDICT r2 "What's wrong" #1)
    from pyspark.sql import types as T

    nested = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not nested, f"nested types in final projection: {nested}"
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    problems = compare(df, con, ORACLES[name], name)
    assert not problems, "\n".join(problems)
