"""asof_join / range_join: exact semantics vs tiny hand-computed
fixtures and a pandas.merge_asof cross-check on random data."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.temporal_join import (
    asof_join,
    range_join,
)


def _ts(m, s=0, us=0):
    return dt.datetime(2024, 1, 1, 0, m, s, us)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=_ts(0), px=1.0),
            Row(sym="A", ts=_ts(5), px=2.0),
            Row(sym="A", ts=_ts(9), px=3.0),
            Row(sym="B", ts=_ts(4), px=10.0),
        ]
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=_ts(0), qty=1),   # exact tie -> px=1.0
            Row(sym="A", ts=_ts(4), qty=2),   # -> px=1.0 (t=0)
            Row(sym="A", ts=_ts(7), qty=3),   # -> px=2.0 (t=5)
            Row(sym="A", ts=_ts(20), qty=4),  # -> px=3.0 (t=9)
            Row(sym="B", ts=_ts(1), qty=5),   # before any quote -> null
            Row(sym="C", ts=_ts(2), qty=6),   # no quotes at all -> null
        ]
    )


def test_asof_backward(spark, quotes, trades):
    out = (
        asof_join(trades, quotes, on="sym")
        .orderBy("sym", "ts")
        .collect()
    )
    got = [(r["sym"], r["qty"], r["px"], r["ts_r"]) for r in out]
    assert got == [
        ("A", 1, 1.0, _ts(0)),
        ("A", 2, 1.0, _ts(0)),
        ("A", 3, 2.0, _ts(5)),
        ("A", 4, 3.0, _ts(9)),
        ("B", 5, None, None),
        ("C", 6, None, None),
    ]


def test_asof_forward(spark, quotes, trades):
    out = (
        asof_join(trades, quotes, on="sym", direction="forward")
        .orderBy("sym", "ts")
        .collect()
    )
    got = [(r["sym"], r["qty"], r["px"]) for r in out]
    assert got == [
        ("A", 1, 1.0),   # exact tie counts forward too
        ("A", 2, 2.0),
        ("A", 3, 3.0),
        ("A", 4, None),  # nothing after t=20
        ("B", 5, 10.0),
        ("C", 6, None),
    ]


def test_asof_tolerance(spark, quotes, trades):
    out = (
        asof_join(trades, quotes, on="sym", tolerance_s=180.0)
        .orderBy("sym", "ts")
        .collect()
    )
    # qty=2 sits 4 min after its quote -> dropped by 3-min tolerance
    got = {r["qty"]: r["px"] for r in out}
    assert got == {1: 1.0, 2: None, 3: 2.0, 4: None, 5: None, 6: None}


def test_asof_right_ts_collapse(spark):
    """Two right rows at the SAME (key, ts): the max-struct collapse
    wins deterministically (the larger payload struct)."""
    left = spark.createDataFrame([Row(k="x", ts=_ts(1))])
    right = spark.createDataFrame(
        [Row(k="x", ts=_ts(0), v=5), Row(k="x", ts=_ts(0), v=9)]
    )
    out = asof_join(left, right, on="k").collect()
    assert out[0]["v"] == 9


def test_asof_matches_pandas_merge_asof(spark):
    """Random data vs pandas.merge_asof (right collapsed to one row
    per (key, ts) the same way, so 'last occurrence' ambiguity is
    out of play)."""
    import numpy as np

    rng = np.random.RandomState(7)
    n_l, n_r = 300, 200
    lpdf = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_l).astype(str),
            "ts": pd.to_datetime(rng.randint(0, 10_000, n_l), unit="s"),
            "lid": np.arange(n_l),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_r).astype(str),
            "ts": pd.to_datetime(rng.randint(0, 10_000, n_r), unit="s"),
            "val": rng.randint(0, 1000, n_r),
        }
    )
    rpdf = rpdf.groupby(["k", "ts"], as_index=False)["val"].max()
    exp = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]),
        rpdf.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lid")
    got = (
        asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), on="k")
        .orderBy("lid")
        .toPandas()
    )
    assert list(got["lid"]) == list(exp["lid"])
    pd.testing.assert_series_equal(
        got["val"].astype("float64"),
        exp["val"].astype("float64"),
        check_index=False,
        check_names=False,
    )


def test_asof_null_keys_never_match(spark):
    """SQL equi-join semantics: NULL keys never match (r4 ADVICE —
    Window.partitionBy groups NULLs into one partition, so NULL-key
    left rows used to inherit NULL-key right payloads). Left NULL-key
    rows survive with NULL payloads; right NULL-key rows are ignored."""
    left = spark.createDataFrame(
        [Row(sym=None, ts=_ts(5), qty=1), Row(sym="A", ts=_ts(5), qty=2)]
    )
    right = spark.createDataFrame(
        [Row(sym=None, ts=_ts(0), px=99.0), Row(sym="A", ts=_ts(0), px=1.0)]
    )
    got = {r["qty"]: r["px"]
           for r in asof_join(left, right, on="sym").collect()}
    assert got == {1: None, 2: 1.0}
    # pandas.merge_asof rejects NULL keys outright; our contract is
    # the SQL one — row-preserving left with no NULL-to-NULL match.


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_split_ranges_equals_unsplit(spark, direction):
    """The split_ranges hot-key guard is a pure partitioning change:
    result set is identical to the unsplit plan, including rows whose
    match crosses a range boundary (the carry-in path) and ranges
    with no right rows at all."""
    import numpy as np

    rng = np.random.RandomState(11)
    n_l, n_r = 400, 120
    # one deliberately hot key ('0') plus sparse ones
    lk = np.where(rng.rand(n_l) < 0.7, "0", rng.randint(0, 4, n_l).astype(str))
    lpdf = pd.DataFrame({
        "k": lk,
        "ts": pd.to_datetime(rng.randint(0, 10_000, n_l), unit="s"),
        "lid": np.arange(n_l),
    })
    rpdf = pd.DataFrame({
        "k": rng.randint(0, 4, n_r).astype(str),
        "ts": pd.to_datetime(rng.randint(0, 10_000, n_r), unit="s"),
        "val": rng.randint(0, 1000, n_r),
    })
    ldf, rdf = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    base = (
        asof_join(ldf, rdf, on="k", direction=direction)
        .orderBy("lid").collect()
    )
    for n in (2, 7):
        split = (
            asof_join(ldf, rdf, on="k", direction=direction, split_ranges=n)
            .orderBy("lid").collect()
        )
        assert split == base


def test_asof_split_ranges_with_tolerance(spark, quotes, trades):
    base = asof_join(trades, quotes, on="sym", tolerance_s=180.0)
    split = asof_join(
        trades, quotes, on="sym", tolerance_s=180.0, split_ranges=3
    )
    assert sorted(map(tuple, split.collect())) == sorted(map(tuple, base.collect()))


def test_asof_plan_single_shuffle(spark, quotes, trades):
    """The as-of plan shuffles ONCE on the key (union feeds one
    window); no join node appears at all."""
    plan = asof_join(trades, quotes, on="sym")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("hashpartitioning(sym") >= 1


# ---------------------------------------------------------------- range


def test_range_join_basic(spark):
    pts = spark.createDataFrame(
        [Row(k="a", ts=_ts(m), pid=m) for m in (0, 10, 30, 59)]
    )
    iv = spark.createDataFrame(
        [
            Row(k="a", start=_ts(0), end=_ts(10), iid=1),   # inclusive both
            Row(k="a", start=_ts(25), end=_ts(40), iid=2),
            Row(k="b", start=_ts(0), end=_ts(59), iid=3),   # other key
        ]
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, on="k", grid_s=600).collect()
    )
    assert got == [(0, 1), (10, 1), (30, 2)]


def test_range_join_no_duplicate_matches(spark):
    """An interval spanning many grid cells still matches each point
    exactly once (the point's cell is unique)."""
    pts = spark.createDataFrame([Row(ts=_ts(30), pid=1)])
    iv = spark.createDataFrame([Row(start=_ts(0), end=_ts(59), iid=1)])
    out = range_join(pts, iv, on=None, grid_s=60).collect()
    assert len(out) == 1


def test_range_join_span_guard(spark):
    pts = spark.createDataFrame([Row(ts=_ts(0), pid=1)])
    iv = spark.createDataFrame(
        [Row(start=_ts(0), end=dt.datetime(2024, 6, 1), iid=1)]
    )
    with pytest.raises(Exception, match="max_span_cells"):
        range_join(pts, iv, on=None, grid_s=60, max_span_cells=10).collect()


def test_range_join_collision_guard(spark):
    pts = spark.createDataFrame([Row(k="a", ts=_ts(0), x=1)])
    iv = spark.createDataFrame(
        [Row(k="a", start=_ts(0), end=_ts(1), x=2)]
    )
    with pytest.raises(ValueError, match="colliding"):
        range_join(pts, iv, on="k")


def test_range_join_is_equijoin_not_nested_loop(spark):
    pts = spark.createDataFrame([Row(k="a", ts=_ts(0), pid=1)])
    iv = spark.createDataFrame(
        [Row(k="a", start=_ts(0), end=_ts(5), iid=1)]
    )
    plan = range_join(pts, iv, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
