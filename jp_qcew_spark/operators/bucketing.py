"""Bucketed tables — shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact ⋈ fact equi-join is shuffling BOTH
sides on the join key — every row crosses the network once per join, every
time the join runs. Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions rows into a fixed number of
per-partition files, and records the layout in the catalog. Every later
equi-join or aggregation on the bucket key then reads co-located buckets
and runs with ZERO Exchange in the plan — the scan's outputPartitioning
already satisfies the operator's distribution requirement.

This is the Spark-native analogue of the reference keeping its facts in a
single-file DuckDB database (reference README.md:56-65, where locality is
free because everything is one local file): on a cluster, locality has to
be *declared*, and bucketing is the declaration.

Scale rules encoded here:
- ``n_buckets`` must match across tables that join together (Spark joins
  bucketed tables shuffle-free only on equal bucket counts; a mismatch
  re-shuffles the smaller side).
- ``sortBy`` the bucket key: sorted buckets let SortMergeJoin skip its
  per-task sort when ``spark.sql.legacy.bucketedTableScan.outputOrdering``
  is enabled, and make per-bucket reads streamable either way.
- Pick n_buckets so one bucket of the BIGGEST table fits an executor's
  task comfortably (~128-512 MB); all smaller co-bucketed tables inherit
  the count.

tests/test_bucketing.py pins the contract: a fact⋈fact join and a
groupBy on the bucket key both plan with zero Exchange operators.
"""

from __future__ import annotations

import atexit
import shutil

from pyspark.sql import DataFrame, SparkSession

#: app_id -> (catalog tables, external-layout directories) awaiting cleanup.
#: Per-application layouts fixed the round-6 concurrent-overwrite race, but
#: left every session's /tmp directory and bco_* catalog entries behind
#: (ADVICE r6) — this registry deletes THIS application's layouts at
#: interpreter exit (or eagerly via cleanup_bucketed_layouts), keeping the
#: race fix while bounding /tmp growth at one live session's working set.
#: Directories are a SET: a second registration under the same app with a
#: different base path must not orphan the first (ADVICE r7).
_PENDING_CLEANUPS: dict[str, tuple[set[str], set[str]]] = {}
_ATEXIT_ARMED = False


def register_layout_cleanup(
    spark: SparkSession, tables: list[str], path: str
) -> None:
    """Arrange for ``tables`` and the external layout directory ``path`` to
    be removed at interpreter exit (idempotent per application)."""
    global _ATEXIT_ARMED
    app = spark.sparkContext.applicationId
    known, paths = _PENDING_CLEANUPS.get(app, (set(), set()))
    _PENDING_CLEANUPS[app] = (known | set(tables), paths | {path})
    if not _ATEXIT_ARMED:
        atexit.register(cleanup_bucketed_layouts)
        _ATEXIT_ARMED = True


def cleanup_bucketed_layouts() -> None:
    """Drop registered bucketed catalog tables (if a session is still alive
    to drop them in) and delete their external directories. Safe to call
    eagerly once no pending DataFrame still reads the layout; atexit calls
    it as a backstop for normal interpreter shutdown."""
    spark = SparkSession.getActiveSession()
    for app, (tables, paths) in list(_PENDING_CLEANUPS.items()):
        if spark is not None:
            for t in sorted(tables):
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {t}")
                except Exception:
                    pass  # session already stopped mid-shutdown
        for path in sorted(paths):
            shutil.rmtree(path, ignore_errors=True)
        _PENDING_CLEANUPS.pop(app, None)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and sorted) by ``keys``.

    ``path`` makes it an external table (data survives DROP TABLE);
    omitted, the session's warehouse dir owns the files.
    """
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    With matching bucket counts this plans as a SortMergeJoin with no
    Exchange on either side — the write-time shuffle is reused. No hint
    needed; the optimizer reads the layout from the catalog.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
