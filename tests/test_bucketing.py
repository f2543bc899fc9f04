"""Bucketed co-located joins: the plan contract (no Exchange between
two co-bucketed tables; shuffle reappears when one side isn't
bucketed) and result parity with a plain join."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def tables(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.select("event_id", "user_id", "value")
    right = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    )
    write_bucketed(left, "b_left", "user_id", 8)
    write_bucketed(right, "b_right", "user_id", 8)
    right.write.mode("overwrite").format("parquet").saveAsTable("p_right")
    yield "b_left", "b_right", "p_right", left, right
    for t in ("b_left", "b_right", "p_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """The no-exchange contract is about the SHUFFLE join path: at
    test scale Spark would otherwise broadcast the small side (which
    also makes the planner disable bucketed scans as pointless)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cobucketed_join_has_no_exchange(spark, tables, no_broadcast):
    bl, br, _, _, _ = tables
    joined = colocated_join(spark, bl, br, "user_id")
    joined.collect()
    plan = _plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucket_sorted_write_skips_join_sort(spark, tables, no_broadcast):
    """sortBy at write time + one file per bucket (the repartition in
    write_bucketed) + the legacy outputOrdering flag: the
    SortMergeJoin consumes the scans with no per-bucket Sort operator
    either. (Spark 3+ stopped reporting sorted scan output by default
    — SPARK-28216 — because multi-file buckets would need a merge.)"""
    bl, br, _, _, _ = tables
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    try:
        joined = colocated_join(spark, bl, br, "user_id")
        joined.collect()
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan
        assert "Sort [user_id" not in plan, plan
    finally:
        spark.conf.unset(
            "spark.sql.legacy.bucketedTableScan.outputOrdering"
        )


def test_unbucketed_side_reintroduces_shuffle(spark, tables, no_broadcast):
    bl, _, pr, _, _ = tables
    joined = colocated_join(spark, bl, pr, "user_id")
    joined.collect()
    # the unbucketed side must shuffle
    assert "Exchange hashpartitioning" in _plan(joined)


def test_result_parity_with_plain_join(spark, tables):
    bl, br, _, left, right = tables
    got = sorted(
        map(tuple, colocated_join(spark, bl, br, "user_id").collect())
    )
    exp = sorted(map(tuple, left.join(right, "user_id").collect()))
    assert got == exp


def test_bad_bucket_count(spark, tables):
    _, _, _, left, _ = tables
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(left, "b_bad", "user_id", 0)
