"""Corpus drift (operators/drift.py): per-bucket PSI/KL must equal an
independent Python reference, emit EVERY bucket (empty ones carry the
signal), and be exactly zero-drift on identical snapshots."""

import math

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.drift import (
    bucketize,
    feature_drift,
)

EDGES = [10.0, 20.0, 30.0]


def _ref(vals_a, vals_b, edges, s=0.5):
    k = len(edges) + 1

    def bucket(x):
        for i, e in enumerate(edges):
            if x < e:
                return i
        return len(edges)

    na = [0] * k
    nb = [0] * k
    for v in vals_a:
        na[bucket(v)] += 1
    for v in vals_b:
        nb[bucket(v)] += 1
    ta, tb = sum(na), sum(nb)
    out = {}
    for i in range(k):
        fa = (na[i] + s) / (ta + s * k)
        fb = (nb[i] + s) / (tb + s * k)
        out[i] = (
            na[i],
            nb[i],
            round(fa, 9),
            round(fb, 9),
            round((fa - fb) * math.log(fa / fb), 9),
            round(fa * math.log(fa / fb), 9),
        )
    return out


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def test_matches_reference(spark):
    va = [1, 5, 12, 15, 22, 25, 28, 35, 40, 11]
    vb = [2, 14, 14, 21, 33, 38, 39, 41, 8, 9, 29]
    got = {
        r["bucket"]: (
            r["n_a"],
            r["n_b"],
            r["frac_a"],
            r["frac_b"],
            r["psi_term"],
            r["kl_term"],
        )
        for r in feature_drift(
            _df(spark, va), _df(spark, vb), "x", EDGES
        ).collect()
    }
    want = _ref(va, vb, EDGES)
    assert got.keys() == want.keys() == set(range(4))
    for k in want:
        assert got[k][:2] == want[k][:2]
        for g, w in zip(got[k][2:], want[k][2:]):
            assert g == pytest.approx(w, abs=1e-9)


def test_identical_snapshots_zero_drift(spark):
    vals = [5, 15, 25, 35, 15, 25]
    res = feature_drift(
        _df(spark, vals), _df(spark, vals), "x", EDGES
    ).collect()
    assert len(res) == 4
    for r in res:
        # fa == fb exactly -> ln(1) == 0.0 exactly, no tolerance needed
        assert r["psi_term"] == 0.0 and r["kl_term"] == 0.0


def test_empty_and_missing_buckets_still_emit(spark):
    # snapshot B empty entirely; bucket 2 empty on both sides
    res = {
        r["bucket"]: r
        for r in feature_drift(
            _df(spark, [1, 35]), _df(spark, []), "x", EDGES
        ).collect()
    }
    assert set(res) == {0, 1, 2, 3}
    assert res[2]["n_a"] == 0 and res[2]["n_b"] == 0
    # empty-B smoothed fractions are uniform 1/k; psi is finite
    assert res[0]["frac_b"] == pytest.approx(0.25, abs=1e-9)
    assert all(math.isfinite(r["psi_term"]) for r in res.values())


def test_null_features_excluded(spark):
    df_a = spark.createDataFrame([(1.0,), (None,)], "x double")
    res = {
        r["bucket"]: r["n_a"]
        for r in feature_drift(df_a, _df(spark, [1]), "x", EDGES).collect()
    }
    assert res[0] == 1 and sum(res.values()) == 1


def test_bucketize_edges_are_left_inclusive(spark):
    df = spark.createDataFrame(
        [(9.999,), (10.0,), (19.999,), (20.0,), (30.0,)], "x double"
    )
    got = [
        r["b"]
        for r in df.select(
            bucketize(F.col("x"), EDGES).alias("b")
        ).collect()
    ]
    assert got == [0, 1, 1, 2, 3]


def test_validation():
    with pytest.raises(ValueError, match="sorted"):
        feature_drift(None, None, "x", [3.0, 1.0])
    with pytest.raises(ValueError, match="smoothing"):
        feature_drift(None, None, "x", EDGES, smoothing=0.0)
