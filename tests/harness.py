"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, normalizes both result
sets (columns sorted by name, rows sorted, floats compared with tight
tolerance), and reports mismatches. Pre-verifies the CORRECTNESS gate locally
before the driver does it at sf=0.01.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

from jp_qcew_spark.io import TABLES

REL_TOL = 1e-9
ABS_TOL = 1e-9


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_value(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, list):
        return tuple(_norm_value(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def fetch_spark(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_value(r[c]) for c in cols) for r in df.collect()]
    rows.sort(key=_sort_key)
    return cols, rows


def fetch_duckdb(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_norm_value(r[i]) for i in order) for r in cur.fetchall()]
    rows.sort(key=_sort_key)
    return cols, rows


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=REL_TOL, abs_tol=ABS_TOL)
        except (TypeError, ValueError):
            return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, con, oracle: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    s_cols, s_rows = fetch_spark(spark_df)
    d_cols, d_rows = fetch_duckdb(con, oracle)
    problems: list[str] = []
    if s_cols != d_cols:
        problems.append(f"[{name}] columns differ: spark={s_cols} duckdb={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(
            f"[{name}] row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
        )
        return problems
    bad = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not _values_equal(sr, dr):
            bad += 1
            if bad <= 3:
                problems.append(f"[{name}] row {i}: spark={sr!r} duckdb={dr!r}")
    if bad > 3:
        problems.append(f"[{name}] ... {bad} mismatched rows total")
    return problems
