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


def _col_types(raw_rows: list[tuple], ncols: int) -> list[set]:
    """Python type names observed per column (None excluded) BEFORE
    normalization — the driver's value-hash is type-sensitive (Decimal from a
    DuckDB HUGEINT sum vs Spark's int hashed differently in round 1), so the
    local check must see raw types too."""
    types: list[set] = [set() for _ in range(ncols)]
    for r in raw_rows:
        for i, v in enumerate(r):
            if v is not None:
                types[i].add(type(v).__name__)
    return types


def fetch_spark(df) -> tuple[list[str], list[tuple], list[set]]:
    cols = sorted(df.columns)
    raw = [tuple(r[c] for c in cols) for r in df.collect()]
    rows = [tuple(_norm_value(v) for v in r) for r in raw]
    rows.sort(key=_sort_key)
    return cols, rows, _col_types(raw, len(cols))


#: DuckDB logical output types whose Arrow surface diverges from anything
#: Spark can emit (HUGEINT -> decimal128(38,0), DECIMAL(p,s) -> decimal128):
#: a type-sensitive driver hash can NEVER match these. The DBAPI cursor
#: converts them to plain Python int/Decimal, which is exactly why value-level
#: inspection missed the r5/r6 `sketch_countmin_topk` red two rounds running —
#: so we read the RELATION's logical types, not the fetched values.
_FATAL_DUCKDB_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def fetch_duckdb(
    con, sql: str
) -> tuple[list[str], list[tuple], list[set], list[str]]:
    rel = con.sql(sql)
    names = list(rel.columns)
    logical = [str(t) for t in rel.types]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    logical = [logical[i] for i in order]
    raw = [tuple(r[i] for i in order) for r in rel.fetchall()]
    rows = [tuple(_norm_value(v) for v in r) for r in raw]
    rows.sort(key=_sort_key)
    return cols, rows, _col_types(raw, len(cols)), logical


def _type_divergence(name, cols, s_types, d_types, d_logical) -> list[str]:
    """Flag the proven driver-hash killers: DuckDB logical output types
    (HUGEINT from integer sum(), or DECIMAL) whose Arrow surface is
    decimal128 where Spark emits long/double. Checked on the RELATION's
    logical types — the DBAPI cursor converts HUGEINT to plain Python int,
    which made value-level inspection certify `sketch_countmin_topk` as
    byte-identical in r5 AND r6 while the driver's type-sensitive hash
    stayed red. Other cross-type pairs (date vs datetime, bool vs int)
    hash-matched in round 1, so only Decimal-surface types are fatal."""
    problems = []
    for c, lt in zip(cols, d_logical):
        if any(f in str(lt).upper() for f in _FATAL_DUCKDB_TYPES):
            problems.append(
                f"[{name}] column {c!r}: oracle logical type {lt} surfaces as "
                f"Arrow decimal128 where Spark emits long/double — driver "
                f"value-hash WILL mismatch; CAST the oracle output to "
                f"BIGINT/DOUBLE"
            )
    for c, st, dt in zip(cols, s_types, d_types):
        if not st or not dt or st == dt:
            continue
        if "Decimal" in dt and dt != st:
            problems.append(
                f"[{name}] column {c!r}: duckdb yields Decimal {sorted(dt)} vs "
                f"spark {sorted(st)} — driver value-hash WILL mismatch; "
                f"CAST the oracle aggregate"
            )
    return problems


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
    s_cols, s_rows, s_types = fetch_spark(spark_df)
    d_cols, d_rows, d_types, d_logical = fetch_duckdb(con, oracle)
    problems: list[str] = []
    if s_cols != d_cols:
        problems.append(f"[{name}] columns differ: spark={s_cols} duckdb={d_cols}")
        return problems
    problems.extend(_type_divergence(name, s_cols, s_types, d_types, d_logical))
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
