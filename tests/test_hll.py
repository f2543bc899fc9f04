"""HyperLogLog (operators/sketches.py hll_sketch / hll_merge /
hll_estimate): register-max mergeability (the property that justifies
per-partition / per-day sketch roll-ups), estimator accuracy on both
branches (raw harmonic mean and small-range linear counting), and the
integer-exactness of the harmonic denominator (replay determinism)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)

P = 8
M = 1 << P


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, k long")


def test_merge_equals_global(spark):
    """Sketching two disjoint halves and merging must give the
    byte-identical register table to sketching the union — the
    max-monoid law the per-day rollup story rests on."""
    rng = random.Random(3)
    rows = [("g", rng.randrange(10_000)) for _ in range(5000)]
    df = _df(spark, rows).cache()
    whole = hll_sketch(df, ["g"], F.col("k"), p=P)
    halves = [
        hll_sketch(df.filter(F.col("k") % 2 == i), ["g"], F.col("k"), p=P)
        for i in (0, 1)
    ]
    merged = hll_merge(halves, ["g"])
    sym = whole.exceptAll(merged).count() + merged.exceptAll(whole).count()
    assert sym == 0
    df.unpersist()


def test_duplicates_do_not_move_registers(spark):
    """HLL is a distinct counter: replicating every row 7x must leave
    the register table unchanged."""
    rows = [("g", k) for k in range(500)]
    df = _df(spark, rows)
    df7 = _df(spark, rows * 7)
    a = hll_sketch(df, ["g"], F.col("k"), p=P)
    b = hll_sketch(df7, ["g"], F.col("k"), p=P)
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


@pytest.mark.parametrize("n", [50, 640, 5000, 40_000])
def test_estimate_within_theory(spark, n):
    """Relative error within 5 sigma of the 1.04/sqrt(m) HLL bound
    (raw branch) / the linear-counting regime for small n. A much
    larger error means register addressing or the estimator branch is
    broken, not bad luck."""
    rows = [("g", k * 2654435761 % 2**31) for k in range(n)]
    est = hll_estimate(
        hll_sketch(_df(spark, rows), ["g"], F.col("k"), p=P), ["g"], p=P
    ).collect()[0]
    rel = abs(est.est_distinct - n) / n
    assert rel < 5 * 1.04 / math.sqrt(M), (n, est.est_distinct, rel)


def test_small_range_branch_is_linear_counting(spark):
    """With n << m the estimator must take the linear-counting branch
    m * ln(m / zeros) — recompute it from the register count and
    compare exactly (same rounding)."""
    rows = [("g", k) for k in range(20)]
    sk = hll_sketch(_df(spark, rows), ["g"], F.col("k"), p=P)
    n_regs = sk.count()
    est = hll_estimate(sk, ["g"], p=P).collect()[0]
    assert est.n_regs == n_regs
    expected = round(float(M) * math.log(float(M) / (M - n_regs)), 3)
    assert est.est_distinct == pytest.approx(expected, abs=1e-9)


def test_null_keys_ignored(spark):
    rows = [("g", 1), ("g", 2), ("g", None)]
    df = spark.createDataFrame(rows, "g string, k long")
    sk = hll_sketch(df, ["g"], F.col("k"), p=P)
    no_null = hll_sketch(df.filter(F.col("k").isNotNull()), ["g"], F.col("k"), p=P)
    assert sk.exceptAll(no_null).count() + no_null.exceptAll(sk).count() == 0


def test_rank_bounds(spark):
    """Register values must live in [1, W_BITS+1] = [1, 23] for p=8 —
    an out-of-range rank means the bitlen arithmetic drifted from the
    oracle's CASE twin."""
    rng = random.Random(11)
    rows = [("g", rng.randrange(2**40)) for _ in range(20_000)]
    sk = hll_sketch(_df(spark, rows), ["g"], F.col("k"), p=P)
    bad = sk.filter((F.col("r") < 1) | (F.col("r") > 23)).count()
    assert bad == 0
    js = sk.agg(F.min("j"), F.max("j")).collect()[0]
    assert js[0] >= 0 and js[1] <= M - 1
