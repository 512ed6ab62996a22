"""Unit tests for io.py's widen_scan decision helpers (ADVICE r4): the
byte-size conf parser and the URI-safe local file stat. Pure-Python — no
Spark session needed."""

from __future__ import annotations

import os

import pytest

from jp_qcew_spark.io import _byte_string_as_bytes, _local_file_size

DEFAULT = 134217728


def test_byte_string_plain_and_suffixed():
    assert _byte_string_as_bytes("134217728") == 134217728
    # the ADVICE r4 case: '128m' must be 128 MiB, not 128 bytes
    assert _byte_string_as_bytes("128m") == 128 << 20
    assert _byte_string_as_bytes("128MB") == 128 << 20
    assert _byte_string_as_bytes("1g") == 1 << 30
    assert _byte_string_as_bytes(" 64k ") == 64 << 10
    assert _byte_string_as_bytes("512b") == 512
    assert _byte_string_as_bytes("2t") == 2 << 40


def test_byte_string_unparseable_falls_back():
    assert _byte_string_as_bytes("") == DEFAULT
    assert _byte_string_as_bytes("abc") == DEFAULT
    assert _byte_string_as_bytes("12x") == DEFAULT
    assert _byte_string_as_bytes(None) == DEFAULT
    assert _byte_string_as_bytes("1.5g") == DEFAULT  # Spark rejects these too


def test_local_file_size_decodes_uris(tmp_path):
    p = tmp_path / "a file.parquet"  # space -> %20 in inputFiles() URIs
    p.write_bytes(b"x" * 123)
    uri = "file://" + str(p).replace(" ", "%20")
    assert _local_file_size(uri) == 123
    assert _local_file_size(str(p)) == 123  # bare path entries too


def test_local_file_size_skips_remote_and_missing(tmp_path):
    assert _local_file_size("s3://bucket/key.parquet") is None
    assert _local_file_size("hdfs://nn:8020/x.parquet") is None
    assert _local_file_size(str(tmp_path / "missing.parquet")) is None


class TestScopedCaching:
    """Round-6 cache-scoping contract (VERDICT r5 #3): engine-internal
    persists are tracked; the registry releases the previous query's caches
    when a different query builds; release_caches() drains the rest. A
    long-lived session must end a multi-query sweep with an EMPTY cache
    manager without spark.catalog.clearCache()."""

    def _cache_empty(self, spark) -> bool:
        return spark._jsparkSession.sharedState().cacheManager().isEmpty()

    def test_sweep_leaves_no_caches(self, spark, sf_dir):
        from jp_qcew_spark.io import release_caches
        from jp_qcew_spark.queries import all_queries

        qs = all_queries()
        # persist-heavy representatives: IVF+PQ (the r5-cited leak site),
        # LSH candidate verify, pagerank supersteps, kmeans supersteps
        for name in (
            "knn_ivfpq",
            "dedup_jaccard_pairs",
            "graph_pagerank",
            "kmeans_cluster",
        ):
            assert qs[name](spark, sf_dir).collect()
            # caches from the PREVIOUS query must be gone once the next one
            # built (checked on the following loop iteration implicitly)
        release_caches()
        assert self._cache_empty(spark)

    def test_sweep_leaves_no_checkpoint_blocks(self, spark, sf_dir):
        """localCheckpoint blocks live OUTSIDE the cache manager (round-6
        extension of the r5 leak fix): after the iterative operators run
        and the scope is released, getPersistentRDDs must be empty too —
        not just the SQL cache."""
        from jp_qcew_spark.io import release_caches
        from jp_qcew_spark.queries import all_queries

        qs = all_queries()
        for name in ("dedup_components", "graph_pagerank"):
            assert qs[name](spark, sf_dir).collect()
        release_caches()
        assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0

    def test_same_query_rebuild_keeps_warm_cache(self, spark, sf_dir):
        from jp_qcew_spark.io import release_caches
        from jp_qcew_spark.queries import all_queries

        qs = all_queries()
        qs["dedup_jaccard_pairs"](spark, sf_dir).collect()
        assert not self._cache_empty(spark)  # warm across same-name rebuilds
        qs["dedup_jaccard_pairs"](spark, sf_dir)
        assert not self._cache_empty(spark)
        # a DIFFERENT query's build releases them
        qs["pricing_summary"](spark, sf_dir)
        assert self._cache_empty(spark)
        release_caches()

    def test_released_checkpoint_errors_not_recomputes(self, spark):
        """The build-then-materialize contract, pinned (VERDICT r6 #6 /
        ADVICE r6): a RELEASED tracked localCheckpoint cannot silently
        recompute — its lineage was truncated — so an embedder that builds
        query A, builds query B (releasing A's scope), and only then
        collects A gets a CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND job failure,
        not stale or recomputed data. This is the documented caveat in
        io.track_local_checkpoint; materialize each query's result before
        building the next."""
        import time

        from pyspark.sql import functions as F

        from jp_qcew_spark.io import release_caches, track_local_checkpoint

        df = spark.range(1000).withColumn("x", F.col("id") * 2)
        cp = track_local_checkpoint(df)
        assert cp.count() == 1000  # blocks live: checkpoint serves reads
        release_caches()
        # unpersist(blocking=False): poll until async block removal lands
        # (a single fixed sleep flaked on loaded machines — ADVICE r7)
        deadline = time.time() + 30.0
        while True:
            try:
                cp.count()
            except Exception as exc:  # noqa: BLE001 — asserting on message
                assert "CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND" in str(exc)
                break
            assert time.time() < deadline, (
                "released checkpoint still serving reads after 30s"
            )
            time.sleep(0.2)
