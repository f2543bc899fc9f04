"""Bloom-pruned join (operators/bloomjoin.py): the bitmap prune must
be a pure optimization — output hash-equal to the plain join — while
actually dropping non-matching probe rows before the shuffle."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.bloomjoin import (
    bloom_might_contain,
    bloom_pruned_join,
    build_bloom,
)


def _build(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_join_equals_plain_join(spark):
    probe = spark.range(2000).select(
        (F.col("id") % 500).alias("pk"), F.col("id").alias("payload")
    )
    build = _build(spark, [3, 7, 11, 400, 499]).withColumn(
        "tag", F.col("k") * 10
    )
    got = {
        (r["pk"], r["payload"], r["tag"])
        for r in bloom_pruned_join(probe, build, "pk", "k").collect()
    }
    want = {
        (r["pk"], r["payload"], r["tag"])
        for r in probe.join(build, probe["pk"] == build["k"]).collect()
    }
    assert got == want and len(got) == 5 * 4


def test_no_false_negatives_ever(spark):
    # every build key must pass its own filter — structural property
    keys = list(range(0, 5000, 7))
    bitmap = build_bloom(_build(spark, keys), "k")
    df = _build(spark, keys)
    n = df.filter(
        bloom_might_contain(F.col("k"), bitmap, 1 << 16, 4)
    ).count()
    assert n == len(keys)


def test_actually_prunes_disjoint_probe(spark):
    bitmap = build_bloom(_build(spark, range(100)), "k")
    probe = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    survivors = probe.filter(
        bloom_might_contain(F.col("k"), bitmap, 1 << 16, 4)
    ).count()
    # fp rate at 100 keys / 65536 bits / k=4 is ~(400/65536)^4 ~ 1e-9;
    # allow slack but demand real pruning
    assert survivors < 20_000 * 0.01


def test_null_keys_never_match(spark):
    bitmap = build_bloom(_build(spark, [1, 2]), "k")
    df = spark.createDataFrame([(None,), (1,)], "k long")
    got = [
        r["k"]
        for r in df.filter(
            bloom_might_contain(F.col("k"), bitmap, 1 << 16, 4)
        ).collect()
    ]
    assert got == [1]


def test_overload_raises(spark):
    with pytest.raises(ValueError, match="overloaded"):
        build_bloom(spark.range(200_000), "id", m_bits=64 * 8, k=4)


def test_bad_args(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(spark.range(5), "id", m_bits=100)
    with pytest.raises(ValueError, match="inner|left_semi"):
        bloom_pruned_join(
            spark.range(5), spark.range(5), "id", "id", how="left"
        )


def test_prune_is_scan_fused_no_extra_shuffle(spark):
    """The membership predicate is a literal-array Filter in the probe
    scan stage — no exchange, no join node added by the prune."""
    bitmap = build_bloom(_build(spark, [1, 2, 3]), "k")
    probe = spark.range(1000).select(F.col("id").alias("k"))
    plan = (
        probe.filter(bloom_might_contain(F.col("k"), bitmap, 1 << 16, 4))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
