"""Exact heavy hitters (operators/heavy_hitters.py): the MG candidate
pass must be a pure optimization — output hash-equal to plain
GROUP BY ... HAVING under ANY partitioning, including the degenerate
partitions that empty the counter set."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.heavy_hitters import (
    heavy_hitters,
)


def _plain(df, key, t):
    n = df.filter(F.col(key).isNotNull()).count()
    return {
        (r["k"], r["c"])
        for r in df.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > t * n)
        .collect()
    }


@pytest.mark.parametrize("t,parts", [(0.1, 1), (0.1, 7), (0.02, 16)])
def test_equals_group_by_having(spark, t, parts):
    df = (
        spark.range(4000)
        .select((F.col("id") * F.col("id") % 97).alias("k"))
        .repartition(parts)
    )
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "k", t).collect()}
    assert got == _plain(df, "k", t)


def test_empty_counter_partition_still_counts_rows(spark):
    """Regression: a partition whose MG counters all decrement away
    ([x, y, z] with m=2) must still contribute its row count to n —
    losing it lowers the bar and admits false positives."""
    rdd = spark.sparkContext.parallelize(
        [("a",), ("a",), ("a",), ("x",), ("y",), ("z",)], 2
    )
    df = spark.createDataFrame(rdd, "k string")  # p0=[a,a,a] p1=[x,y,z]
    assert df.rdd.getNumPartitions() == 2
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "k", 0.5).collect()}
    assert got == _plain(df, "k", 0.5) == set()  # 3 > 0.5*6 is false


def test_nulls_excluded_and_bad_threshold(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,)], "k string"
    )
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "k", 0.6).collect()}
    assert got == {("a", 2)}  # n counts non-null rows only
    with pytest.raises(ValueError, match="threshold"):
        heavy_hitters(df, "k", 1.5)
