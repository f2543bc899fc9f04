"""KMV distinct sketch: exactness under-full, estimator accuracy,
merge associativity/idempotence, plan shape (map-side partial
rank-limit before the shuffle)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.sketches import (
    kmv_estimate,
    kmv_hash,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_underfull_group_is_exact(spark):
    df = spark.createDataFrame(
        [Row(g="a", key=i % 7) for i in range(100)]
    )
    sk = kmv_sketch(df, ["g"], F.col("key"), k=64)
    est = kmv_estimate(sk, ["g"], k=64).collect()[0]
    assert est["n_kept"] == 7 and est["est_distinct"] == 7.0


def test_duplicate_hashes_do_not_eat_slots(spark):
    """1000 rows over 5 distinct keys, k=8: the sketch keeps exactly
    the 5 distinct hashes once each."""
    df = spark.createDataFrame([Row(g="a", key=i % 5) for i in range(1000)])
    sk = kmv_sketch(df, ["g"], F.col("key"), k=8).collect()
    assert len(sk) == 5
    assert sorted(r["pos"] for r in sk) == [1, 2, 3, 4, 5]
    assert len({r["h"] for r in sk}) == 5


def test_estimator_accuracy(spark):
    """10_000 distinct keys, k=256 -> relative error well inside
    5/sqrt(k-2) (~31%); typically ~6%."""
    df = spark.range(10_000).select(F.lit("g").alias("g"), F.col("id"))
    sk = kmv_sketch(df, ["g"], F.col("id"), k=256)
    est = kmv_estimate(sk, ["g"], k=256).collect()[0]["est_distinct"]
    assert abs(est - 10_000) / 10_000 < 5 / (254**0.5)


def test_merge_equals_whole(spark, events):
    """Sketch(day1) U Sketch(day2) == Sketch(day1+day2) exactly —
    the roll-up property that makes the sketch worth persisting."""
    k = 32
    day1 = events.filter(F.dayofmonth("ts") <= 15)
    day2 = events.filter(F.dayofmonth("ts") > 15)
    g = ["event_type"]
    key = F.col("user_id")
    merged = kmv_merge(
        [kmv_sketch(day1, g, key, k=k), kmv_sketch(day2, g, key, k=k)], g, k
    )
    whole = kmv_sketch(events, g, key, k=k)
    got = {(r["event_type"], r["pos"]): r["h"] for r in merged.collect()}
    exp = {(r["event_type"], r["pos"]): r["h"] for r in whole.collect()}
    assert got == exp


def test_merge_idempotent(spark, events):
    k = 16
    sk = kmv_sketch(events, ["event_type"], F.col("user_id"), k=k)
    twice = kmv_merge([sk, sk], ["event_type"], k)
    assert sorted(map(tuple, twice.collect())) == sorted(
        map(tuple, sk.collect())
    )


def test_xxhash64_variant_runs(spark, events):
    sk = kmv_sketch(
        events, ["event_type"], F.col("user_id"), k=16, hasher="xxhash64"
    )
    est = kmv_estimate(sk, ["event_type"], k=16, hasher="xxhash64")
    rows = est.collect()
    assert all(r["est_distinct"] > 0 for r in rows)
    # decimal(20,0) mapping keeps hashes in [0, 2^64)
    assert all(0 <= int(r["h"]) < 2**64 for r in sk.collect())


def test_null_keys_ignored_like_count_distinct(spark):
    """NULL keys must not occupy sketch slots (countDistinct
    semantics): 3 real keys + NULLs -> 3 slots, exact estimate."""
    df = spark.createDataFrame(
        [Row(g="a", key=k) for k in [1, 2, 3, None, None]]
    )
    sk = kmv_sketch(df, ["g"], F.col("key"), k=8)
    rows = sk.collect()
    assert len(rows) == 3 and all(r["h"] is not None for r in rows)
    est = kmv_estimate(sk, ["g"], k=8).collect()[0]
    assert est["n_kept"] == 3 and est["est_distinct"] == 3.0


def test_bad_args(spark, events):
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(events, ["event_type"], F.col("user_id"), k=2)
    with pytest.raises(ValueError, match="unknown hasher"):
        kmv_hash(F.col("x"), hasher="md5")


def test_plan_has_partial_window_group_limit(spark, events):
    """The raw-stream rank-limit must compile to WindowGroupLimit with
    a Partial mode instance BELOW the exchange (map-side sketch
    accumulation)."""
    sk = kmv_sketch(events, ["event_type"], F.col("user_id"), k=16)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan
