"""Triangle counting: known tiny graphs, brute-force parity on a
random graph, orientation invariance, and plan sanity."""

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.triangles import (
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs]
    )


def _counts(df):
    return {r["vertex"]: r["n_triangles"] for r in df.collect()}


def test_single_triangle(spark):
    out = _counts(triangle_counts(_edges(spark, [(1, 2), (2, 3), (3, 1)])))
    assert out == {1: 1, 2: 1, 3: 1}


def test_square_no_triangle(spark):
    out = triangle_counts(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ).collect()
    assert out == []


def test_k4_four_triangles(spark):
    pairs = list(itertools.combinations(range(4), 2))
    out = _counts(triangle_counts(_edges(spark, pairs)))
    # K4: each vertex sits in C(3,2)=3 triangles; 4 triangles total
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_duplicate_and_reversed_edges_ignored(spark):
    out = _counts(
        triangle_counts(
            _edges(
                spark,
                [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)],
            )
        )
    )
    assert out == {1: 1, 2: 1, 3: 1}


def test_brute_force_parity_random_graph(spark):
    import random

    rng = random.Random(11)
    n = 40
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(300)
            )
            if a != b
        }
    )
    eset = set(pairs)
    exp: dict[int, int] = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            for v in (x, y, z):
                exp[v] = exp.get(v, 0) + 1
    got = _counts(triangle_counts(_edges(spark, pairs)))
    assert got == exp


def test_hub_graph(spark):
    """A star plus one rim edge: exactly one triangle despite the
    degree-n hub (the orientation bound in action)."""
    pairs = [(0, i) for i in range(1, 30)] + [(1, 2)]
    out = _counts(triangle_counts(_edges(spark, pairs)))
    assert out == {0: 1, 1: 1, 2: 1}
