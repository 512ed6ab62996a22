"""Physical data layout — the write-side half of scan performance.

At 100 TB the fastest scan is the one that never reads the file: parquet
footers carry per-row-group min/max stats, and a reader with a predicate
on column ``c`` skips every row group whose [min, max] excludes the value.
Those stats are only selective if the DATA IS CLUSTERED on ``c`` — a
random layout gives every row group the full value range and nothing
skips. These operators make clustering and file sizing explicit:

- ``write_clustered``  — global range-partition on the cluster keys, sort
  within partitions, write: each output file owns a disjoint key range, so
  point/range predicates touch ~1 file (the "zone map" / sort-projection
  layout every warehouse builds).
- ``compact_small_files`` — rewrite a directory of accumulated small files
  (streaming sinks, incremental loads) into ~target-sized files. Small
  files are a silent scale killer: a 100 TB table in 4 MB files is 25M
  scheduler tasks and 25M footer reads before byte one of data.

Both are plain DataFrame writes — no custom committers — so they inherit
Spark's atomic job-commit semantics.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered on ``cluster_by`` into ``n_files`` files.

    ``repartitionByRange`` samples the keys and assigns each output
    partition a DISJOINT key range (one shuffle — the clustering cost,
    paid once at write); ``sortWithinPartitions`` orders rows inside each
    file so row groups within a file are selective too. Readers then prune
    at three levels: file ranges, row-group min/max, and page indexes —
    all from the same one-time sort.
    """
    (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` (parquet dir) into ~``target_mb``-sized files;
    returns the new file count. With ``cluster_by`` the rewrite also
    restores clustering (compaction is the natural moment to re-sort).

    Sizing uses the CURRENT on-disk bytes as the estimate — compression
    ratios survive a rewrite of the same data, so bytes/target rounds to
    the right count without a second pass. The rewrite goes through a
    temp dir then an atomic-enough swap (rename), because overwrite-in-
    place of the directory being read is undefined.
    """
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(size / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    if cluster_by:
        (
            df.repartitionByRange(n, *cluster_by)
            .sortWithinPartitions(*cluster_by)
            .write.mode("overwrite")
            .parquet(tmp)
        )
    else:
        df.repartition(n).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    return sum(
        1
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
