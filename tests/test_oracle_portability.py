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


def test_no_wide_hex_string_casts(oracles):
    """'0x'||hex casts are tolerated only up to 4 hex chars (<= 16 bits of
    value, verified against the round-3/5 drivers); anything wider must
    use the positional-instr Horner parse (see ORACLE_SKETCH_COUNTMIN /
    ORACLE_SAMPLE_WEIGHTED)."""
    wide = []
    for name, sql in oracles.items():
        for m in re.finditer(
            r"'0x'[^)]*substr\([^,]+,\s*[^,]+,\s*(\d+)\s*\)", sql
        ):
            if int(m.group(1)) > 4:
                wide.append((name, m.group(0)))
    assert not wide, f"wide hex-string casts (driver-red class): {wide}"


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
