"""Round-12 additions: trained ANN quantizers (IVF spherical k-means
cells, per-subspace PQ codebooks), the SNM recall eval, and the round's
ADVICE fixes (footer-counter empty-listing guard, site-level hint pin,
bloom negative-key normalization — the latter extends an r11 test)."""

from __future__ import annotations

import pytest


def test_metadata_row_count_empty_listing_falls_back(spark, monkeypatch):
    """A scan that exposes NO input files must fall back to the Spark
    count, never report n=0 from an empty footer sum (ADVICE r11: an
    LSH config derived from n=0 would silently misconfigure every
    downstream query)."""
    # the CLASSIC class, not the pyspark.sql base — the base's
    # inputFiles is overridden there and a base-class patch never
    # intercepts (found vacuous in round 13)
    from pyspark.sql.classic.dataframe import DataFrame

    import jp_qcew_spark.io as io_mod

    monkeypatch.setattr(DataFrame, "inputFiles", lambda self: [])
    got = io_mod.metadata_row_count(
        spark, "/root/testdata/sf0.001", "region"
    )
    assert got == 5  # the real count, via the fallback scan


def test_snm_recall_eval_curve_and_plan(spark, sf_dir):
    """dedup_snm_recall_eval: one row per swept window, recall in [0, 1]
    and nondecreasing in the window (a wider window is a superset of
    candidate pairs), pairs_compared exactly w·N − w(w+1)/2, planted
    count bounded by the stride target; plan keeps the family rules —
    no cartesian beyond the bounded broadcast sides (window/total
    scalars), no corpus-sized broadcast hint."""
    from jp_qcew_spark.plans import inspect as I
    from jp_qcew_spark.queries.dedup import (
        _SNM_EVAL_WINDOWS,
        _SNM_PLANT_TARGET,
        q_dedup_snm_recall_eval,
    )

    df = q_dedup_snm_recall_eval(spark, sf_dir)
    # every broadcast hint is a bounded side (offsets table, the 3-row
    # window set, 1-row totals): 4 sites
    assert I.broadcast_hint_sites(df) == 4
    rows = df.orderBy("win").collect()
    assert [r["win"] for r in rows] == list(_SNM_EVAL_WINDOWS)
    n_union = None
    for r in rows:
        assert 0 <= r["found"] <= r["planted_pairs"] <= _SNM_PLANT_TARGET
        assert 0.0 <= r["recall"] <= 1.0
        w = r["win"]
        derived_n = (r["pairs_compared"] + w * (w + 1) // 2) // w
        n_union = n_union or derived_n
        assert derived_n == n_union  # same N at every window
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls)


def test_snm_positions_shared_with_pipeline(spark, sf_dir):
    """The eval's sort positions ARE the pipeline's: _snm_positions over
    the un-planted corpus reproduces dedup_sorted_neighborhood's global
    rank exactly (prefix-bucket offsets == one global row_number)."""
    from pyspark.sql import functions as F

    from jp_qcew_spark.io import load_table
    from jp_qcew_spark.queries.dedup import _snm_base, _snm_positions

    base = _snm_base(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    got = _snm_positions(base)
    from pyspark.sql import Window as W

    ref = base.withColumn(
        "pos",
        F.row_number()
        .over(W.orderBy(F.col("key").asc(), F.col("doc_id").asc()))
        .cast("long"),
    ).select("doc_id", "pos")
    diff = (
        got.select("doc_id", "pos")
        .exceptAll(ref)
        .count()
    )
    assert diff == 0


def test_ivf_nlist_sweep_tradeoff_and_plan(spark, sf_dir, monkeypatch):
    """knn_ivf_nlist_sweep: one row per swept nlist; scan fraction
    strictly DECREASES as nlist grows (more cells ⇒ smaller home cell)
    while recall stays in [0, 1]; no cartesian product; zero pre-query
    jobs beyond the footer count (the k-means chains are lazy)."""
    # classic class — base-class count patches are vacuous (round 13)
    from pyspark.sql.classic.dataframe import DataFrame

    from jp_qcew_spark.plans import inspect as I
    from jp_qcew_spark.queries.similarity import (
        _IVF_NLIST_SWEEP,
        q_knn_ivf_nlist_sweep,
    )

    def _boom(self):
        raise AssertionError("count() during build — must stay lazy")

    monkeypatch.setattr(DataFrame, "count", _boom)
    df = q_knn_ivf_nlist_sweep(spark, sf_dir)
    monkeypatch.undo()
    assert not I.has_cartesian_product(df)
    rows = df.orderBy("nlist").collect()
    assert [r["nlist"] for r in rows] == list(_IVF_NLIST_SWEEP)
    fracs = [r["scan_frac"] for r in rows]
    assert fracs == sorted(fracs, reverse=True)
    assert all(0.0 < f < 1.0 for f in fracs)
    assert all(0.0 <= r["recall_at3"] <= 1.0 for r in rows)


def test_broadcast_hint_sites_dedupes_reexpansion(spark):
    """broadcast_hint_sites counts hinted SUBTREES, not analyzer
    re-expansions: one hinted frame referenced twice is one site even
    though the occurrence counter sees two (ADVICE r11)."""
    from pyspark.sql import functions as F

    from jp_qcew_spark.plans import inspect as I

    dim = F.broadcast(spark.range(3).select(F.col("id").alias("k")))
    fact = spark.range(100).select((F.col("id") % 3).alias("k"), "id")
    a = fact.join(dim, "k").groupBy("k").count()
    b = fact.join(dim, "k").groupBy("k").agg(F.sum("id").alias("s"))
    df = a.join(b, "k")
    assert I.broadcast_hint_sites(df) == 1
    assert I.broadcast_hint_count(df) >= 2
