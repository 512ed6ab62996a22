"""Round-11 pins: the threshold-aware cost sweep (VERDICT r10 #4), the
footer-metadata config scalar (#6), and the ADVICE-r10 guards (planted-id
collision, half-up quantization tie rule, graph rail message, band-key
divisibility)."""

from __future__ import annotations

import math

import pytest


def test_rp_cfg_sweep_sql_parity():
    """The oracle's SQL sweep (the EXACT text the targeted CTEs embed,
    via _rp_cfg_sweep_sql) derives the same (bands, bits) as the Python
    cfg across corpus sizes spanning the floor-optimal, swept-optimal,
    and budget-bound regimes."""
    import duckdb

    from jp_qcew_spark.queries.similarity import (
        _lsh_cfg_rp_target,
        _rp_cfg_sweep_sql,
    )

    ns = [60, 100, 700, 1100, 3100, 6100, 30100, 61100, 90100, 610100]
    ns += [137, 999, 4097, 65537, 250_000, 1_500_000, 3_000_000]
    for n in ns:
        py = _lsh_cfg_rp_target(n)
        sq = duckdb.sql(_rp_cfg_sweep_sql(f"range(0, {n})")).fetchone()
        assert (py[0], py[1]) == (sq[0], sq[1]), (n, py, sq)


def test_qgrid_half_up_tie_rule():
    """_qgrid uses floor(x*s+0.5)/s — HALF-UP, matching the SQL twin —
    not Python round()'s banker's rule (ADVICE r10: the two engines'
    native round() tie directions differ)."""
    import duckdb

    from jp_qcew_spark.queries.similarity import _qgrid

    # exact midpoints: banker's would round 0.5/1e6 DOWN to 0, 1.5/1e6
    # DOWN... no — to 2; half-up takes both UP
    assert _qgrid(0.0000005, 1e6) == pytest.approx(1e-6)
    assert _qgrid(0.0000015, 1e6) == pytest.approx(2e-6)
    # Python round() disagrees on the first (banker's: 0.0)
    assert round(0.0000005, 6) == 0.0
    # and the SQL form is the same expression, value for value
    vals = [0.0000005, 0.0000015, 0.1234567, 0.795**12, 0.999999]
    for v in vals:
        sq = duckdb.sql(
            f"SELECT floor({v!r} * 1e6 + 0.5) / 1e6"
        ).fetchone()[0]
        assert _qgrid(v, 1e6) == sq, v


def test_aug_vecs_collision_guard(spark, sf_dir, monkeypatch):
    """A corpus whose vec_ids reach the planted-cohort offsets must
    refuse to build the certification fixture (ADVICE r10: duplicate
    vec_ids would corrupt the scoring joins identically on both engines
    — invisible to the driver's hash compare)."""
    from jp_qcew_spark.queries import similarity as sim

    monkeypatch.setattr(
        sim, "metadata_row_count", lambda *a, **k: 1_000_000
    )
    with pytest.raises(ValueError, match="collide"):
        sim._aug_vecs(spark, sf_dir)


def test_metadata_row_count_matches_spark(spark):
    """The footer-metadata count equals the Spark count on every oracle
    table at two scales — the fast path the config derivations now use
    (VERDICT r10 #6) is exact, not an estimate."""
    from jp_qcew_spark.io import load_table, metadata_row_count

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in ("embeddings", "documents", "lineitem"):
            assert metadata_row_count(spark, sf_dir, name) == load_table(
                spark, sf_dir, name
            ).count(), (sf_dir, name)
    with pytest.raises(ValueError, match="unknown table"):
        metadata_row_count(spark, "/root/testdata/sf0.01", "nope")


def test_targeted_tier_builds_without_count_job(spark, sf_dir, monkeypatch):
    """Building the targeted queries launches ZERO pre-query jobs: the
    config scalar comes from parquet footers, so DataFrame.count is
    never called during plan construction (VERDICT r10 #6 'pin it')."""
    from pyspark.sql import DataFrame

    from jp_qcew_spark.queries.similarity import (
        q_dedup_embedding_rp_target,
        q_dedup_recall_target_eval,
    )

    def _boom(self):
        raise AssertionError(
            "DataFrame.count() ran during query build — the config "
            "scalar must come from parquet footer metadata"
        )

    monkeypatch.setattr(DataFrame, "count", _boom)
    df1 = q_dedup_embedding_rp_target(spark, sf_dir)
    df2 = q_dedup_recall_target_eval(spark, sf_dir)
    assert df1.columns and df2.columns


def test_cc_rail_message_names_pinned_limit(spark):
    """A caller-pinned max_iter failure reports the PINNED budget, not
    the derived-rail formula (ADVICE r10)."""
    from jp_qcew_spark.ext.graph import connected_components
    from jp_qcew_spark.io import release_caches

    # a 9-node chain needs ~4 alternating-star rounds; max_iter=1 trips
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="caller-pinned max_iter=1"):
        connected_components(edges, max_iter=1)
    release_caches()
    # the derived-rail path keeps its formula message (unchanged)
    got = connected_components(edges).collect()
    assert {(r["id"], r["comp"]) for r in got} == {
        (i, 0) for i in range(9)
    }
    release_caches()


def test_minhash_band_keys_rejects_ragged_config():
    """num_hashes not divisible by rows_per_band fails loudly instead of
    silently shrinking the band-key space (ADVICE r10)."""
    from pyspark.sql import functions as F

    from jp_qcew_spark.ext.dedup import minhash_band_keys

    with pytest.raises(ValueError, match="multiple of"):
        minhash_band_keys(F.col("text"), num_hashes=13, rows_per_band=4)
