"""Time-decayed aggregates (operators/decay.py): weights must match
the literal exp formula, the monoid property must hold (partials add;
re-anchoring is one multiply), and late rows must not be clamped."""

import math

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.decay import (
    decayed_agg,
    reanchor,
)

REF = "2024-02-01 00:00:00"
HL = 7.0
_US_PER_DAY = 86_400_000_000


def _w(age_days):
    return math.exp(-math.log(2) / HL * age_days)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )


def test_matches_formula(spark):
    rows = [
        ("a", "2024-01-31 00:00:00", 2.0),  # age 1d
        ("a", "2024-01-25 00:00:00", 4.0),  # age 7d -> weight 0.5
        ("b", "2024-01-18 00:00:00", 8.0),  # age 14d -> weight 0.25
    ]
    out = {
        r.g: r
        for r in decayed_agg(
            _df(spark, rows), ["g"], "ts", REF, HL, value=F.col("v")
        ).collect()
    }
    assert out["a"].n == 2
    assert out["a"].decayed_count == pytest.approx(_w(1) + _w(7), abs=1e-9)
    assert out["a"].decayed_sum == pytest.approx(
        2 * _w(1) + 4 * _w(7), abs=1e-9
    )
    assert out["b"].decayed_count == pytest.approx(0.25, abs=1e-9)
    assert out["b"].decayed_sum == pytest.approx(2.0, abs=1e-9)


def test_half_life_semantics(spark):
    rows = [("a", "2024-01-25 00:00:00", 1.0)]  # exactly one half-life
    [r] = decayed_agg(_df(spark, rows), ["g"], "ts", REF, HL).collect()
    assert r.decayed_count == pytest.approx(0.5, abs=1e-9)


def test_late_rows_weigh_above_one(spark):
    rows = [("a", "2024-02-08 00:00:00", 1.0)]  # 7d AFTER the ref
    [r] = decayed_agg(_df(spark, rows), ["g"], "ts", REF, HL).collect()
    assert r.decayed_count == pytest.approx(2.0, abs=1e-9)


def test_null_ts_excluded(spark):
    rows = [("a", "2024-01-31 00:00:00", 1.0), ("a", None, 1.0)]
    [r] = decayed_agg(_df(spark, rows), ["g"], "ts", REF, HL).collect()
    assert r.n == 1


def test_monoid_reanchor_merge(spark):
    rows = [
        ("a", f"2024-01-{d:02d} 07:00:00", float(d)) for d in range(1, 29)
    ]
    df = _df(spark, rows)
    old_ref = "2024-01-15 00:00:00"
    part1 = decayed_agg(
        df.filter(F.dayofmonth("ts") <= 14), ["g"], "ts", old_ref, HL,
        value=F.col("v"),
    )
    part2 = decayed_agg(
        df.filter(F.dayofmonth("ts") > 14), ["g"], "ts", REF, HL,
        value=F.col("v"),
    )
    moved = reanchor(
        part1, old_ref, REF, HL, ["decayed_count", "decayed_sum"]
    )
    merged = (
        moved.unionByName(part2)
        .groupBy("g")
        .agg(
            F.sum("n").alias("n"),
            F.sum("decayed_count").alias("decayed_count"),
            F.sum("decayed_sum").alias("decayed_sum"),
        )
        .collect()[0]
    )
    full = decayed_agg(df, ["g"], "ts", REF, HL, value=F.col("v")).collect()[0]
    assert merged.n == full.n
    assert merged.decayed_count == pytest.approx(
        full.decayed_count, abs=1e-7
    )
    assert merged.decayed_sum == pytest.approx(full.decayed_sum, abs=1e-7)


def test_bad_half_life(spark):
    df = _df(spark, [("a", "2024-01-01 00:00:00", 1.0)])
    with pytest.raises(ValueError):
        decayed_agg(df, ["g"], "ts", REF, 0.0)
