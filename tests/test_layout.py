"""Layout contract: clustered writes produce skippable files; compaction
collapses small-file sprawl without changing the data."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from jp_qcew_spark.io import load_table
from jp_qcew_spark.operators.layout import compact_small_files, write_clustered


def _file_ranges(path: str, col: str) -> list[tuple]:
    """Per parquet file, the (min, max) of ``col`` across its row groups —
    the exact stats a reader's predicate pushdown consults."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_clustered_write_disjoint_ranges(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_clustered")
    write_clustered(orders, out, ["o_custkey"], n_files=8)

    ranges = sorted(_file_ranges(out, "o_custkey"))
    assert len(ranges) >= 2  # range partitioner actually split the keyspace
    # DISJOINT file ranges: every file owns its own slice of o_custkey, so
    # a point predicate overlaps exactly one file's [min, max]
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    probe = orders.select("o_custkey").limit(1).collect()[0][0]
    overlapping = [1 for lo, hi in ranges if lo <= probe <= hi]
    assert len(overlapping) == 1

    # the rewrite is lossless
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    a = back.agg(F.sum("o_orderkey")).collect()[0][0]
    b = orders.agg(F.sum("o_orderkey")).collect()[0][0]
    assert a == b


def test_compact_small_files(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "sprawl")
    orders.repartition(40).write.parquet(out)  # simulate sink sprawl
    n_before = len(glob.glob(f"{out}/*.parquet"))
    assert n_before >= 40

    total = orders.count()
    n_after = compact_small_files(spark, out, target_mb=256)
    assert n_after < n_before
    assert n_after <= 2  # sf test data is far below one target file
    assert spark.read.parquet(out).count() == total


def test_compact_preserves_clustering(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "li")
    li.repartition(16).write.parquet(out)
    compact_small_files(spark, out, target_mb=1, cluster_by=["l_orderkey"])
    ranges = sorted(_file_ranges(out, "l_orderkey"))
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    assert spark.read.parquet(out).count() == li.count()
