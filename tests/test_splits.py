"""Leakage-safe splits + per-group quota caps (operators/splits.py)."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.splits import (
    assign_split,
    cap_per_group,
)

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _hosts_df(spark, n_groups=200, rows_per=5):
    rows = [
        (g * 1000 + i, f"host{g:03d}.example", f"doc {g}/{i}")
        for g in range(n_groups)
        for i in range(rows_per)
    ]
    return spark.createDataFrame(rows, "id long, host string, text string")


def test_split_is_group_pure_and_covering(spark):
    df = assign_split(_hosts_df(spark), "host", SPLITS, seed=3)
    per_group = df.groupBy("host").agg(
        F.countDistinct("split").alias("k"), F.first("split").alias("s")
    )
    assert per_group.filter("k != 1").count() == 0  # no leakage
    got = {r["s"] for r in per_group.collect()}
    assert got == {"train", "val", "test"}  # all splits materialize
    frac = (
        df.groupBy("split").count().withColumn("f", F.col("count") / df.count())
    )
    fr = {r["split"]: r["f"] for r in frac.collect()}
    assert 0.7 < fr["train"] < 0.9 and fr["val"] < 0.2 and fr["test"] < 0.2


def test_split_deterministic_and_seed_sensitive(spark):
    df = _hosts_df(spark)
    a = {(r["id"], r["split"]) for r in assign_split(df, "host", SPLITS, 1).collect()}
    b = {(r["id"], r["split"]) for r in assign_split(df.repartition(13), "host", SPLITS, 1).collect()}
    c = {(r["id"], r["split"]) for r in assign_split(df, "host", SPLITS, 2).collect()}
    assert a == b  # partitioning-invariant
    assert a != c  # seed moves the fence


def test_split_null_group_and_bad_weights(spark):
    df = spark.createDataFrame([(1, None)], "id long, host string")
    assert assign_split(df, "host", SPLITS).collect()[0]["split"] is None
    with pytest.raises(ValueError, match="sum to 1.0"):
        assign_split(df, "host", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="not representable"):
        assign_split(df, "host", {"a": 0.0004, "b": 0.9996})


def test_cap_per_group_exact_and_stable(spark):
    df = _hosts_df(spark, n_groups=30, rows_per=9)
    capped = cap_per_group(df, "host", 4, "id", seed=5)
    sizes = capped.groupBy("host").count().collect()
    assert all(r["count"] == 4 for r in sizes) and len(sizes) == 30
    again = cap_per_group(df.repartition(17), "host", 4, "id", seed=5)
    assert {r["id"] for r in capped.collect()} == {
        r["id"] for r in again.collect()
    }
    # groups under the cap pass through whole
    small = cap_per_group(df.filter("id % 1000 < 2"), "host", 4, "id")
    assert small.count() == 60


def test_cap_window_limit_is_map_side_partial(spark):
    df = _hosts_df(spark, n_groups=50, rows_per=20)
    plan = (
        cap_per_group(df, "host", 3, "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_cap_excludes_null_identities(spark):
    df = spark.createDataFrame(
        [(1, "h"), (2, "h"), (None, "h"), (3, None)],
        "id long, host string",
    )
    got = cap_per_group(df, "host", 5, "id").collect()
    assert sorted(r["id"] for r in got) == [1, 2]
