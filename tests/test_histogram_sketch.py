"""Histogram sketch: merge == whole, quantile accuracy within one
bin width, clamping, NULLs, and degenerate inputs."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.sketches import (
    histogram_quantile,
    histogram_sketch,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_merge_equals_whole(spark, events):
    """Sketch(part1) + Sketch(part2) == Sketch(whole) by count
    addition — the mergeability that approxQuantile state lacks."""
    g, kw = ["event_type"], dict(bins=40, lo=0.0, hi=400.0)
    s1 = histogram_sketch(
        events.filter(F.dayofmonth("ts") <= 15), g, F.col("value"), **kw
    )
    s2 = histogram_sketch(
        events.filter(F.dayofmonth("ts") > 15), g, F.col("value"), **kw
    )
    merged = (
        s1.unionByName(s2)
        .groupBy(*g, "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = histogram_sketch(events, g, F.col("value"), **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_quantile_within_one_bin_width(spark, events):
    kw = dict(bins=80, lo=0.0, hi=400.0)
    sk = histogram_sketch(events, ["event_type"], F.col("value"), **kw)
    est = {
        (r["event_type"], r["q"]): r["est"]
        for r in histogram_quantile(
            sk, ["event_type"], [0.5, 0.95], **kw
        ).collect()
    }
    width = 400.0 / 80
    for et, q in est:
        exact = events.filter(F.col("event_type") == et).approxQuantile(
            "value", [q], 0.0
        )[0]
        assert abs(est[(et, q)] - exact) <= width + 1e-9, (et, q)


def test_clamping_and_nulls(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=-5.0), Row(g="a", v=0.5), Row(g="a", v=99.0),
         Row(g="a", v=None)]
    )
    sk = histogram_sketch(df, ["g"], F.col("v"), bins=10, lo=0.0, hi=1.0)
    got = {r["bin"]: r["cnt"] for r in sk.collect()}
    # -5 clamps to bin 0, 99 clamps to bin 9, NULL dropped
    assert got == {0: 1, 5: 1, 9: 1}


def test_single_value_group(spark):
    df = spark.createDataFrame([Row(g="a", v=3.0)])
    kw = dict(bins=10, lo=0.0, hi=10.0)
    sk = histogram_sketch(df, ["g"], F.col("v"), **kw)
    out = histogram_quantile(sk, ["g"], [0.0, 0.5, 1.0], **kw).collect()
    # n=1: every quantile lands in the single bin [3, 4)
    assert len(out) == 3 and all(3.0 <= r["est"] <= 4.0 for r in out)


def test_bad_args(spark, events):
    with pytest.raises(ValueError, match="bins"):
        histogram_sketch(events, ["event_type"], F.col("value"), bins=0)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_sketch(
            events, ["event_type"], F.col("value"), lo=1.0, hi=1.0
        )
    sk = histogram_sketch(events, ["event_type"], F.col("value"))
    with pytest.raises(ValueError, match="fractions"):
        histogram_quantile(sk, ["event_type"], [1.5])
