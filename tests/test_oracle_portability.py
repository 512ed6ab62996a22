"""Oracle-SQL portability lints (round 6).

The round-5 driver red (sketch_countmin_topk) was not a Spark bug but an
oracle portability bug: ``CAST('0x' || <8 hex chars> AS BIGINT)`` parses
differently across DuckDB builds once the value exceeds 32 bits. These
lints keep the whole oracle corpus inside the portable subset so a future
oracle can't silently reintroduce the class."""

from __future__ import annotations

import re

import pytest

from jp_qcew_spark.queries import all_oracles


@pytest.fixture(scope="module")
def oracles() -> dict[str, str]:
    return all_oracles()


def _substr_len_after(sql: str, start: int) -> int | None:
    """Walk forward from ``start`` to the next ``substr(``, balance parens to
    its matching close, and return its third (length) argument if it is an
    integer literal. Paren-balanced so a first argument containing commas
    (e.g. ``substr(md5(concat(a, b)), 1, 8)``) cannot slip past the lint —
    the round-6 regex failed exactly there (ADVICE r6)."""
    m = re.search(r"substr\s*\(", sql[start:])
    if not m:
        return None
    i = start + m.end()
    depth, args, buf = 1, [], []
    while i < len(sql) and depth:
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        if depth == 1 and ch == ",":
            args.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    args.append("".join(buf))
    if len(args) != 3:
        return None
    try:
        return int(args[2].strip())
    except ValueError:
        return None


def test_no_wide_hex_string_casts(oracles):
    """'0x'||hex casts are tolerated only up to 4 hex chars (<= 16 bits of
    value, verified against the round-3/5 drivers); anything wider must use
    the positional-instr Horner parse (see ORACLE_SKETCH_COUNTMIN /
    ORACLE_SAMPLE_WEIGHTED). EVERY ``'0x'`` occurrence must resolve to a
    provably-narrow substr — an unparseable one fails the lint rather than
    slipping past it (round-6 regex couldn't match comma-bearing substr
    first arguments; ADVICE r6)."""
    bad = []
    for name, sql in oracles.items():
        for m in re.finditer(r"'0x'", sql):
            n = _substr_len_after(sql, m.end())
            if n is None or n > 4:
                bad.append((name, sql[m.start() : m.start() + 80], n))
    assert not bad, f"wide/unparseable hex-string casts (driver-red class): {bad}"


def test_no_hugeint_or_decimal_oracle_outputs(oracles, tmp_path_factory):
    """THE r5+r6 `sketch_countmin_topk` killer, caught at the engine level:
    DuckDB widens integer ``sum()`` to HUGEINT, which surfaces as Arrow
    decimal128(38,0) where Spark emits long — a type-sensitive driver hash
    can never match. Bind every registry oracle against the real sf0.001
    views and reject any HUGEINT/UHUGEINT/DECIMAL *output* column; the fix
    is always ``CAST(... AS BIGINT)`` (or DOUBLE). This reads the
    relation's LOGICAL types — the DBAPI cursor converts HUGEINT to plain
    Python int, which is exactly how the class stayed invisible to local
    value-level checks for two rounds."""
    import os

    from tests.harness import _FATAL_DUCKDB_TYPES, duckdb_conn

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    con = duckdb_conn(sf_dir)
    bad = []
    for name, sql in oracles.items():
        rel = con.sql(sql)
        for col, lt in zip(rel.columns, rel.types):
            if any(f in str(lt).upper() for f in _FATAL_DUCKDB_TYPES):
                bad.append((name, col, str(lt)))
    assert not bad, (
        f"oracle output columns with Decimal-surface logical types "
        f"(driver value-hash can NEVER match): {bad}"
    )


def test_no_with_ordinality(oracles):
    """WITH ORDINALITY is Postgres, not DuckDB — use generate_subscripts."""
    bad = [n for n, sql in oracles.items() if "WITH ORDINALITY" in sql.upper()]
    assert not bad, bad


def test_every_query_has_oracle_and_vice_versa():
    """The driver records a weaker rows-only check for oracle-less queries;
    the registry currently has none, and an oracle for a nonexistent query
    is dead weight."""
    from jp_qcew_spark.queries import all_queries

    qs, os_ = set(all_queries()), set(all_oracles())
    assert qs == os_, (sorted(qs - os_), sorted(os_ - qs))
