"""Z-order clustering: Morton-key math pinned to an independent
driver-side loop, and the layout's actual pruning power through
TxnLog manifest stats (the reason it exists)."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.functions.zorder import (
    bucket_from_bounds,
    int_bucket,
    interleave_bits,
    quantile_bounds,
    zorder_key,
    zvalue_py,
)
from knowledge_harvest_from_lms_spark.txn import TxnLog


def test_interleave_matches_python_reference(spark):
    bits = 5
    rows = [(a, b) for a in range(0, 32, 3) for b in range(0, 32, 5)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", interleave_bits([F.col("a"), F.col("b")], bits)
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == zvalue_py([a, b], bits)
    # locality sanity: adjacent cells differ less than far cells on avg
    assert got[(0, 0)] == 0 and got[(3, 5)] > 0


def test_interleave_three_cols_and_bit_budget(spark):
    df = spark.createDataFrame([(5, 2, 7)], "a long, b long, c long")
    z = df.select(
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], 4).alias("z")
    ).collect()[0]["z"]
    assert z == zvalue_py([5, 2, 7], 4)
    with pytest.raises(ValueError, match="interleaved bits"):
        interleave_bits([F.col("a")] * 5, 16)


def test_int_bucket_exact_clamp_and_null(spark):
    df = spark.createDataFrame(
        [(0,), (99,), (50,), (150,), (-7,), (None,)], "x long"
    )
    out = df.select(int_bucket("x", 0, 99, 3).alias("b")).collect()
    vals = [r["b"] for r in out]
    # (x-0)*8//100 for clamped x
    assert vals == [0, 7, 4, 7, 0, None]


def test_bucket_from_bounds_tree_matches_count_semantics(spark):
    """The r5 binary-search WHEN-tree must equal the defining count
    semantics (#bounds <= v) everywhere: below/above/between/ON every
    boundary, duplicated-looking boundaries, single boundary, NULL."""
    import random

    rng = random.Random(7)
    for bounds in ([5.0], [1.0, 2.0, 3.0], sorted(rng.sample(range(1000), 17)),
                   [float(b) for b in range(0, 255)]):
        bounds = [float(b) for b in bounds]
        vals = sorted(
            {v for b in bounds for v in (b - 0.5, b, b + 0.5)}
            | {bounds[0] - 100, bounds[-1] + 100}
        )
        df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "x double")
        got = {
            r["x"]: r["b"]
            for r in df.select(
                "x", bucket_from_bounds("x", bounds).alias("b")
            ).collect()
        }
        for v in vals:
            assert got[v] == sum(1 for b in bounds if v >= b), (v, bounds)
        assert got[None] is None


def test_quantile_bounds_skew_dedup(spark):
    # 90% of mass on one hot value: equal-population boundaries
    # collapse there and must dedupe, not emit empty buckets
    df = spark.createDataFrame(
        [(7,)] * 900 + [(i,) for i in range(100)], "x long"
    )
    bounds = quantile_bounds(df, "x", bits=3, relative_error=0.0)
    assert bounds == sorted(set(bounds))
    b = df.select(bucket_from_bounds("x", bounds).alias("b")).distinct()
    ids = sorted(r["b"] for r in b.collect())
    assert len(ids) >= 2 and ids[0] == 0  # hot value isolated from tail


def test_zorder_compaction_prunes_on_every_column(spark, tmp_path):
    """The point of the feature: after zorder_by=["x","y"], a range
    predicate on x alone AND on y alone each prune most files —
    a linear sort_by=["x"] layout only prunes on x."""
    rows = [(i, (i * 7919) % 1000, i * 3) for i in range(20_000)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    zlog = TxnLog(spark, str(tmp_path / "z"))
    zlog.commit(overwrites={"t": df})
    zlog.compact("t", target_file_bytes=40_000, zorder_by=["x", "y"],
                 zorder_bits=6)
    m = zlog._load(2)
    assert m["meta"]["compaction"]["zorder"]["cols"] == ["x", "y"]

    slog = TxnLog(spark, str(tmp_path / "s"))
    slog.commit(overwrites={"t": df})
    slog.compact("t", target_file_bytes=40_000, sort_by=["x"],
                 stats_for=["x", "y"])

    _, ztot = zlog.prune_files("t", {"x": (None, None)})
    _, stot = slog.prune_files("t", {"x": (None, None)})
    assert ztot > 4 and stot > 4  # multi-file layouts or the test is vacuous

    for col, lo, hi in (("x", 5_000, 5_400), ("y", 100, 140)):
        zsel, _ = zlog.prune_files("t", {col: (lo, hi)})
        ssel, _ = slog.prune_files("t", {col: (lo, hi)})
        # pruned read == full-scan filter on BOTH layouts
        for log in (zlog, slog):
            a = sorted(
                r["payload"]
                for r in log.read("t", prune={col: (lo, hi)}).collect()
            )
            b = sorted(
                r["payload"]
                for r in log.read("t")
                .filter(F.col(col).between(lo, hi))
                .collect()
            )
            assert a == b
        if col == "x":
            assert len(ssel) < stot  # linear layout prunes its sort key
        else:
            # y-predicate: z-order must beat the linear layout, which
            # cannot prune at all (y is uncorrelated with the x sort)
            assert len(ssel) == stot
            assert len(zsel) < ztot
    # rectangle query: both columns constrain at once
    zsel, ztot2 = zlog.prune_files("t", {"x": (5_000, 5_400), "y": (100, 140)})
    assert len(zsel) <= ztot2 // 2


def test_zorder_int_mode_records_ranges(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 50) for i in range(1000)], "a long, b long"
    )
    z, desc = zorder_key(df, ["a", "b"], bits=4, how="int")
    assert desc["ranges"] == {"a": [0, 999], "b": [0, 49]}
    out = df.withColumn("z", z)
    r = out.filter(F.col("a") == 999).collect()[0]
    assert r["z"] == zvalue_py([15 * 1000 // 1000, (999 % 50) * 16 // 50], 4) or r["z"] >= 0
    # exact replay of one row: bucket_a = (999*16)//1000, bucket_b = (49*16)//50
    assert r["z"] == zvalue_py([(999 * 16) // 1000, (49 * 16) // 50], 4)
