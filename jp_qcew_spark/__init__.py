"""jp_qcew_spark — a PySpark-native analytics engine with the capabilities of
gitinference/jp-qcew (see SURVEY.md), built Spark-first.

Layers
------
- ``session``    : SparkSession factory with scale-aware defaults (AQE, Arrow, UTC).
- ``schema``     : QCEW fixed-width field registry (121 fields; reference
                   src/jp_qcew/decode.json:1-486 re-expressed as Python data).
- ``sources``    : scans — fixed-width text, parquet datasets, CSV dims.
- ``operators``  : relational pipelines — ETL, NAICS aggregate, wages, time-series,
                   event windows, join family (as-of / range / anti).
- ``functions``  : scalar function library — labels, geo (haversine/bbox), text stats.
- ``ext``        : LLM-data-pipeline tier — dedup (exact/minhash/simhash/jaccard),
                   embedding similarity, multimodal binary plumbing.
- ``streaming``  : Structured Streaming variants of the event-window operators.
- ``queries``    : the driver-facing query registry (queries() + oracle_sql()).
"""

__version__ = "0.1.0"


def release_caches() -> int:
    """Release every engine-tracked cache and checkpoint block (see
    ``io.release_caches``). The query registry scopes caches automatically
    (a new query's build releases the previous query's working set);
    embedders that call query builders directly, or that want the LAST
    query's caches gone without building another, call this.

    CONTRACT: materialize (collect/write) each query's result BEFORE
    building the next query or calling this. Released plain caches
    recompute, but released ``localCheckpoint`` blocks cannot (truncated
    lineage) — a retained DataFrame from an earlier scope fails with
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND when collected after release. The
    behavior is pinned in tests/test_io_helpers.py::TestScopedCaching."""
    from jp_qcew_spark.io import release_caches as _rc

    return _rc()
