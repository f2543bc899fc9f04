"""Weighted PageRank operator (operators/graph.py::pagerank):
mass conservation, symmetry, weight proportionality, dangling
redistribution."""

import pytest

from knowledge_harvest_from_lms_spark.operators.graph import pagerank


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_cycle_is_uniform(spark):
    ranks = _pr(spark, [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)])
    assert set(ranks) == {"a", "b", "c"}
    for v in ranks.values():
        assert v == pytest.approx(1 / 3, abs=1e-9)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_star_hub_dominates_and_mass_conserved(spark):
    ranks = _pr(
        spark,
        [("a", "hub", 1.0), ("b", "hub", 1.0), ("c", "hub", 1.0)],
        iters=8,
    )
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert ranks["hub"] == max(ranks.values())
    # leaves are symmetric
    assert ranks["a"] == pytest.approx(ranks["b"], abs=1e-12)
    assert ranks["b"] == pytest.approx(ranks["c"], abs=1e-12)


def test_weight_proportional_contribution(spark):
    # a splits its mass 3:1 between b and c; both are dangling
    ranks = _pr(
        spark, [("a", "b", 3.0), ("a", "c", 1.0)], iters=1, damping=0.85
    )
    n = 3
    base = (1 - 0.85) / n
    dangling0 = 2 / n  # b and c hold 2/3 of the initial mass, no out-edges
    assert ranks["b"] == pytest.approx(
        base + 0.85 * ((1 / n) * 0.75 + dangling0 / n), abs=1e-12
    )
    assert ranks["c"] == pytest.approx(
        base + 0.85 * ((1 / n) * 0.25 + dangling0 / n), abs=1e-12
    )
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_iteration_is_a_contraction(spark):
    """Damped PageRank contracts at rate ~d per iteration: the step
    delta at iteration 12 must be well below the delta at iteration 4
    (0.85^8 ≈ 0.27)."""
    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
             ("b", "a", 1.0), ("c", "b", 3.0)]
    r3 = _pr(spark, edges, iters=3)
    r4 = _pr(spark, edges, iters=4)
    r11 = _pr(spark, edges, iters=11)
    r12 = _pr(spark, edges, iters=12)
    early = max(abs(r4[k] - r3[k]) for k in r3)
    late = max(abs(r12[k] - r11[k]) for k in r11)
    assert late < early * 0.5, (early, late)
    assert sum(r12.values()) == pytest.approx(1.0, abs=1e-9)
