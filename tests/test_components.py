"""Connected components via alternating large-star/small-star
(operators/components.py): pinned against an independent driver-side
union-find on random graphs, adversarial chains, and against
graph.canonical_map on its own home turf."""

import random

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.components import (
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = connected_components(df).collect()
    out = {r["vertex"]: r["component"] for r in got}
    assert len(got) == len(out), "duplicate vertex rows"
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(150)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _union_find(edges)


def test_adversarial_chain_converges_logarithmically(spark):
    # a 200-node path with ids PERMUTED against the chain order — the
    # shape where plain min-label propagation needs ~path-length
    # rounds; the star algorithm must finish inside its O(log n) bound
    rng = random.Random(42)
    ids = [f"v{i:04d}" for i in range(200)]
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    want = _union_find(edges)
    got = _run(spark, edges)
    assert got == want
    assert set(got.values()) == {min(ids)}


def test_cliques_chains_and_singleton_edges(spark):
    edges = (
        [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
        + [("x1", "x2"), ("x2", "x3")]
        + [("solo_a", "solo_b")]
    )
    got = _run(spark, edges)
    assert got == _union_find(edges)


def test_nulls_and_self_loops_dropped(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", None), (None, "b"), ("c", "d")],
        "src string, dst string",
    )
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == {"c": "c", "d": "c"}


def test_matches_canonical_map_on_pair_graphs(spark):
    from knowledge_harvest_from_lms_spark.operators.graph import (
        canonical_map,
    )

    rng = random.Random(9)
    ents = [f"ent{i:02d}" for i in range(40)]
    pairs = [
        (rng.choice(ents), rng.choice(ents)) for _ in range(25)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    pdf = spark.createDataFrame(pairs, "ent_a string, ent_b string")
    edf = spark.createDataFrame([(e,) for e in ents], "ent string")
    cm = {
        r["ent"]: r["canonical"]
        for r in canonical_map(edf, pdf).collect()
    }
    cc = {
        r["vertex"]: r["component"]
        for r in connected_components(
            pdf, src="ent_a", dst="ent_b"
        ).collect()
    }
    # canonical_map also labels isolated ents (as themselves); compare
    # on the edge-touched subset, where both must agree exactly
    assert cc == {e: c for e, c in cm.items() if e in cc}


def test_max_iters_guard(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iters=0)
