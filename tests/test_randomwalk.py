"""Deterministic random walks + bounded transitive closure
(operators/randomwalk.py): walk validity (every step follows a real
edge), determinism across runs and seeds, dead-end truncation, and
exact min-hop closure on a cycle graph."""

import pytest

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.randomwalk import (
    bounded_closure,
    random_walks,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


BRANCHY = [
    ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "a"), ("b", "c"),
    ("c", "a"),
    ("d", "a"), ("d", "b"), ("d", "c"),
]


def test_walks_follow_real_edges_and_have_full_shape(spark):
    e = _edges(spark, BRANCHY)
    w = random_walks(e, walks_per_node=2, walk_length=4, seed=0)
    rows = w.collect()
    # 4 source nodes x 2 walks x (1 + 4) steps; graph has no dead
    # ends, so nothing truncates
    assert len(rows) == 4 * 2 * 5
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.node
        assert r.walk_id.startswith(r.start + "#")
    edge_set = set(BRANCHY)
    for wid, path in by_walk.items():
        assert path[0] == wid.split("#")[0]
        for t in range(1, 5):
            assert (path[t - 1], path[t]) in edge_set, (wid, t, path)


def test_walks_deterministic_and_seed_sensitive(spark):
    e = _edges(spark, BRANCHY)
    a = sorted(map(tuple, random_walks(e, 2, 3, seed=0).collect()))
    b = sorted(map(tuple, random_walks(e, 2, 3, seed=0).collect()))
    assert a == b
    c = sorted(map(tuple, random_walks(e, 2, 3, seed=1).collect()))
    assert a != c  # 8 walks x 3 branching choices: collision ~ 0


def test_dead_end_truncates_walk(spark):
    e = _edges(spark, [("a", "z"), ("b", "a")])  # z has no out-edges
    w = random_walks(e, walks_per_node=1, walk_length=3, seed=0)
    steps = {
        r.walk_id: r.step
        for r in w.groupBy("walk_id").agg(
            F.max("step").alias("step")
        ).collect()
    }
    # a#0 reaches z at step 1 and stops; b#0 goes b->a->z and stops
    assert steps == {"a#0": 1, "b#0": 2}


def test_parallel_edges_do_not_bias_choice_set(spark):
    # duplicates collapse: the candidate set for (a, step 1) is {b, c}
    # exactly once each, so both runs with different seeds stay valid
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "c")])
    w = random_walks(e, walks_per_node=4, walk_length=1, seed=0)
    nodes = {r.node for r in w.filter(F.col("step") == 1).collect()}
    assert nodes <= {"b", "c"}


def test_walk_arg_validation(spark):
    e = _edges(spark, BRANCHY)
    with pytest.raises(ValueError):
        random_walks(e, walks_per_node=0)
    with pytest.raises(ValueError):
        random_walks(e, walk_length=0)


def test_bounded_closure_exact_on_cycle_graph(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")])
    got = {
        (r.src, r.dst): r.hops
        for r in bounded_closure(e, max_hops=3).collect()
    }
    assert got == {
        ("a", "b"): 1, ("a", "d"): 1, ("a", "c"): 2, ("a", "a"): 3,
        ("b", "c"): 1, ("b", "a"): 2, ("b", "b"): 3, ("b", "d"): 3,
        ("c", "a"): 1, ("c", "b"): 2, ("c", "d"): 2, ("c", "c"): 3,
    }


def test_bounded_closure_takes_min_hops(spark):
    # two routes a->d: direct (1 hop) and via b,c (3 hops) — min wins
    e = _edges(
        spark, [("a", "d"), ("a", "b"), ("b", "c"), ("c", "d")]
    )
    got = {
        (r.src, r.dst): r.hops
        for r in bounded_closure(e, max_hops=3).collect()
    }
    assert got[("a", "d")] == 1


def test_bounded_closure_arg_validation(spark):
    e = _edges(spark, BRANCHY)
    with pytest.raises(ValueError):
        bounded_closure(e, max_hops=0)
