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
    from pyspark.sql import DataFrame

    import jp_qcew_spark.io as io_mod

    monkeypatch.setattr(DataFrame, "inputFiles", lambda self: [])
    got = io_mod.metadata_row_count(
        spark, "/root/testdata/sf0.001", "region"
    )
    assert got == 5  # the real count, via the fallback scan


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
