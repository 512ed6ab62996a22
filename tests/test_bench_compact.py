"""bench.py's driver-facing stdout line must always fit the driver's tail.

The round driver records only the last ~2000 chars of combined output and
parses the FINAL line as JSON (BENCH_r01 "parsed": null was a 2930-char
line truncated mid-JSON). These tests pin the compaction invariant for any
suite size, so registry growth can never silently break the bench artifact
again.
"""

from __future__ import annotations

import json

from bench import compact_result_line


def _result(timings):
    return {
        "metric": "suite_seconds_median_per_query",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": 0.1,
        "config": {"spark": "4.1.2", "master": "local[32]"},
    }


def test_small_suite_ships_complete():
    timings = {f"q{i}": 0.5 + i / 100 for i in range(10)}
    line = compact_result_line(_result(timings), timings)
    parsed = json.loads(line)
    assert parsed["queries"] == {k: round(v, 2) for k, v in timings.items()}
    assert "config" in parsed


def test_large_suite_fits_tail_and_keeps_slowest():
    # 300 long-named queries — far past any realistic registry size
    timings = {f"very_long_query_name_number_{i:03d}": i / 10 for i in range(300)}
    line = compact_result_line(_result(timings), timings)
    assert len(line) <= 1900
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["n_queries"] == 300
    assert parsed["more_in"] == "BENCH_LOCAL.json"
    # the slowest query must be inline — that's where regressions show
    assert "very_long_query_name_number_299" in parsed["queries"]
    assert parsed["value"] == round(sum(timings.values()), 3)


def test_current_registry_size_fits_tail():
    from jp_qcew_spark.queries import all_queries

    timings = {name: 1.23 for name in all_queries()}
    timings["qcew_etl_naics_100k"] = 4.5
    line = compact_result_line(_result(timings), timings)
    assert len(line) <= 1900
    assert json.loads(line)["value"] > 0
