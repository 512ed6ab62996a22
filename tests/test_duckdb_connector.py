"""DuckDB connector: distributed read DataSource + Arrow sink (SURVEY S10)."""

from __future__ import annotations

import duckdb
import pytest

from jp_qcew_spark.io import load_table
from jp_qcew_spark.sources.duckdb_io import DuckDBDataSource, write_duckdb


@pytest.fixture(scope="module")
def db(tmp_path_factory, spark, sf_dir):
    """A .duckdb database seeded with the customer oracle table."""
    path = str(tmp_path_factory.mktemp("ddb") / "qcew.duckdb")
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE customer AS "
        f"SELECT * FROM read_parquet('{sf_dir}/customer.parquet')"
    )
    con.execute("CREATE TABLE empty_t (a BIGINT, b VARCHAR)")
    con.close()
    return path


def test_read_matches_duckdb(spark, db, sf_dir):
    spark.dataSource.register(DuckDBDataSource)
    df = (
        spark.read.format("duckdb")
        .option("table", "customer")
        .option("partitions", 3)
        .load(db)
    )
    assert df.rdd.getNumPartitions() == 3
    expect = load_table(spark, sf_dir, "customer")
    assert sorted(df.columns) == sorted(expect.columns)
    assert df.count() == expect.count()
    a = df.agg({"c_acctbal": "sum", "c_custkey": "sum"}).collect()[0]
    b = expect.agg({"c_acctbal": "sum", "c_custkey": "sum"}).collect()[0]
    assert a["sum(c_custkey)"] == b["sum(c_custkey)"]
    # double sum is partition-order-dependent; compare to the cent
    assert round(a["sum(c_acctbal)"], 2) == round(b["sum(c_acctbal)"], 2)


def test_read_empty_table(spark, db):
    spark.dataSource.register(DuckDBDataSource)
    df = spark.read.format("duckdb").option("table", "empty_t").load(db)
    assert df.collect() == []
    assert df.columns == ["a", "b"]


def test_write_roundtrip_and_modes(spark, db, sf_dir, tmp_path):
    out = str(tmp_path / "out.duckdb")
    nation = load_table(spark, sf_dir, "nation")
    n = write_duckdb(nation, out, "nation")
    assert n == nation.count()
    # append doubles, overwrite resets, error raises
    assert write_duckdb(nation, out, "nation", mode="append") == 2 * n
    assert write_duckdb(nation, out, "nation", mode="overwrite") == n
    with pytest.raises(ValueError, match="already exists"):
        write_duckdb(nation, out, "nation", mode="error")
    back = duckdb.connect(out, read_only=True).execute(
        "SELECT count(*), sum(n_nationkey) FROM nation"
    ).fetchone()
    got = nation.agg({"*": "count", "n_nationkey": "sum"}).collect()[0]
    assert back == (got["count(1)"], got["sum(n_nationkey)"])


def test_read_write_cycle_via_spark_sql(spark, db, sf_dir, tmp_path):
    """The reference's S10 shape: engine result -> .ddb -> queryable again."""
    out = str(tmp_path / "cycle.duckdb")
    region = load_table(spark, sf_dir, "region")
    write_duckdb(region, out, "region_t")
    spark.dataSource.register(DuckDBDataSource)
    back = spark.read.format("duckdb").option("table", "region_t").load(out)
    back.createOrReplaceTempView("region_back")
    assert (
        spark.sql("SELECT count(*) AS n FROM region_back").collect()[0].n
        == region.count()
    )
