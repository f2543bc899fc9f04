"""Snapshot diff (operators/snapshot_diff.py): added/removed/changed
classification incl. null-safe value comparison, unchanged rows
omitted, compare-column defaulting, and input validation."""

import pytest

from knowledge_harvest_from_lms_spark.operators.snapshot_diff import (
    snapshot_diff,
)

SCHEMA = "k long, a string, b double"


def _diff(spark, old_rows, new_rows, **kw):
    old = spark.createDataFrame(old_rows, SCHEMA)
    new = spark.createDataFrame(new_rows, SCHEMA)
    return {
        r.k: r.change
        for r in snapshot_diff(old, new, ["k"], **kw).collect()
    }


def test_classification(spark):
    out = _diff(
        spark,
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)],
        [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0)],
    )
    assert out == {1: "removed", 3: "changed", 4: "added"}  # 2 omitted


def test_null_transitions_are_changes(spark):
    out = _diff(
        spark,
        [(1, None, 1.0), (2, "x", None), (3, None, None)],
        [(1, "x", 1.0), (2, "x", None), (3, None, None)],
    )
    # null -> value is a change; null == null is NOT (eqNullSafe)
    assert out == {1: "changed"}


def test_compare_cols_subset(spark):
    out = _diff(
        spark,
        [(1, "x", 1.0)],
        [(1, "CHANGED", 1.0)],
        compare_cols=["b"],
    )
    assert out == {}  # only b compared, b unchanged


def test_identical_snapshots_empty(spark):
    rows = [(1, "x", 1.0), (2, "y", None)]
    assert _diff(spark, rows, rows) == {}


def test_composite_key(spark):
    old = spark.createDataFrame([(1, "x", 1.0)], SCHEMA)
    new = spark.createDataFrame([(1, "x", 2.0)], SCHEMA)
    rows = snapshot_diff(old, new, ["k", "a"]).collect()
    assert [(r.k, r.a, r.change) for r in rows] == [(1, "x", "changed")]


def test_empty_key_rejected(spark):
    df = spark.createDataFrame([(1, "x", 1.0)], SCHEMA)
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [])
