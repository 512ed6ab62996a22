"""ext.skew: salted transforms must be semantically invisible."""

from __future__ import annotations

from pyspark.sql import functions as F

from jp_qcew_spark.ext.skew import salted_join, two_phase_agg, with_salt


def _skewed(spark):
    # 900 rows of key 'hot', a few cold keys
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(20)]
    return spark.createDataFrame(rows, "k string, v long")


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H"), ("k3", "C3"), ("k7", "C7")], "k string, name string"
    )
    plain = big.join(dim, "k").groupBy("k", "name").agg(F.sum("v").alias("s"))
    salted = (
        salted_join(big, dim, on=["k"], n_salts=8)
        .groupBy("k", "name")
        .agg(F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_hot_key(spark):
    salts = (
        with_salt(_skewed(spark), 8)
        .filter(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts >= 4  # hot key occupies several salt slots


def test_two_phase_agg_equals_groupby(spark):
    df = _skewed(spark)
    expect = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    got = {r["k"]: r["agg_value"] for r in two_phase_agg(df, ["k"], F.col("v")).collect()}
    assert got == expect
