"""Count-Min sketch (operators/sketches.py cm_sketch / cm_estimate /
cm_merge): the one-sided error guarantee (est >= exact, always), the
counter-addition mergeability that justifies per-partition /
per-micro-batch roll-ups, and the probe contract."""

import random

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.sketches import (
    cm_estimate,
    cm_merge,
    cm_sketch,
)

D, W = 3, 64


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, k long")


def _zipf_rows(seed, n=2000):
    rng = random.Random(seed)
    # Zipf-ish: key j with weight ~ 1/j over 200 keys, two groups
    keys = [int(1 / rng.random()) % 200 for _ in range(n)]
    return [("a" if rng.random() < 0.6 else "b", k) for k in keys]


def test_estimate_never_undercounts(spark):
    rows = _zipf_rows(seed=5)
    df = _df(spark, rows)
    sk = cm_sketch(df, ["g"], F.col("k"), depth=D, width=W)
    exact = df.groupBy("g", "k").agg(F.count(F.lit(1)).alias("exact"))
    est = cm_estimate(
        sk, exact, ["g"], F.col("k"), depth=D, width=W
    ).collect()
    assert est, "no estimates produced"
    for r in est:
        assert r.est >= r.exact, f"CM undercounted {r}"


def test_exact_on_sparse_keys(spark):
    # far fewer keys than counters -> no collisions -> est == exact
    rows = [("g1", k) for k in range(10) for _ in range(k + 1)]
    df = _df(spark, rows)
    sk = cm_sketch(df, ["g"], F.col("k"), depth=D, width=W)
    exact = df.groupBy("g", "k").agg(F.count(F.lit(1)).alias("exact"))
    est = cm_estimate(sk, exact, ["g"], F.col("k"), depth=D, width=W)
    mism = est.filter(F.col("est") != F.col("exact")).count()
    # with 10 keys in a 3x64 sketch a triple collision is essentially
    # impossible; any mismatch means the addressing is broken
    assert mism == 0


def test_merge_equals_global(spark):
    rows = _zipf_rows(seed=9)
    df = _df(spark, rows).cache()
    half1 = df.filter(F.col("k") % 2 == 0)
    half2 = df.filter(F.col("k") % 2 == 1)
    merged = cm_merge(
        [
            cm_sketch(half1, ["g"], F.col("k"), depth=D, width=W),
            cm_sketch(half2, ["g"], F.col("k"), depth=D, width=W),
        ],
        ["g"],
    )
    whole = cm_sketch(df, ["g"], F.col("k"), depth=D, width=W)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_unseen_probe_key_small_or_zero(spark):
    rows = [("g", k) for k in range(5)]
    df = _df(spark, rows)
    sk = cm_sketch(df, ["g"], F.col("k"), depth=D, width=W)
    probes = spark.createDataFrame([("g", 9999)], "g string, k long")
    [r] = cm_estimate(sk, probes, ["g"], F.col("k"), depth=D, width=W).collect()
    # the unseen key may collide with some counters but min over 3
    # rows of a 5-key sketch is overwhelmingly 0
    assert r.est == 0


def test_null_keys_excluded(spark):
    df = spark.createDataFrame([("g", 1), ("g", None)], "g string, k long")
    sk = cm_sketch(df, ["g"], F.col("k"), depth=D, width=W)
    assert sk.agg(F.sum("cnt")).collect()[0][0] == D  # one key x depth


def test_probe_must_carry_group_cols(spark):
    df = _df(spark, [("g", 1)])
    sk = cm_sketch(df, ["g"], F.col("k"), depth=D, width=W)
    probes = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="group cols"):
        cm_estimate(sk, probes, ["g"], F.col("k"), depth=D, width=W)


def test_bad_params_rejected(spark):
    df = _df(spark, [("g", 1)])
    with pytest.raises(ValueError):
        cm_sketch(df, ["g"], F.col("k"), depth=0, width=W)
    with pytest.raises(ValueError):
        cm_sketch(df, ["g"], F.col("k"), depth=D, width=1)
