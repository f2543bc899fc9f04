"""BGP matching (operators/bgp.py): pattern -> filter compilation,
shared-variable joins, repeated-variable equality, join ordering,
cartesian guard, and bag vs set semantics."""

import pytest

from knowledge_harvest_from_lms_spark.operators.bgp import bgp_match

TRIPLE = "subj string, pred string, obj string"

GRAPH = [
    ("alice", "knows", "bob"),
    ("bob", "knows", "carol"),
    ("alice", "lives_in", "paris"),
    ("bob", "lives_in", "paris"),
    ("carol", "lives_in", "lyon"),
    ("paris", "in_country", "france"),
    ("lyon", "in_country", "france"),
    ("narcissus", "knows", "narcissus"),
]


@pytest.fixture()
def g(spark):
    return spark.createDataFrame(GRAPH, TRIPLE)


def test_single_pattern_constant_filter(g):
    rows = bgp_match(g, [("?x", "lives_in", "paris")]).collect()
    assert {r.x for r in rows} == {"alice", "bob"}
    assert rows[0].__fields__ == ["x"]


def test_two_pattern_join_on_shared_var(g):
    got = {
        (r.a, r.b)
        for r in bgp_match(
            g, [("?a", "knows", "?b"), ("?b", "lives_in", "paris")]
        ).collect()
    }
    assert got == {("alice", "bob")}


def test_three_pattern_chain(g):
    got = {
        (r.p, r.c, r.n)
        for r in bgp_match(
            g,
            [
                ("?p", "lives_in", "?c"),
                ("?c", "in_country", "?n"),
                ("?p", "knows", "?q"),
            ],
        ).collect()
    }
    assert got == {
        ("alice", "paris", "france"),
        ("bob", "paris", "france"),
    }


def test_repeated_variable_within_pattern(g):
    rows = bgp_match(g, [("?x", "knows", "?x")]).collect()
    assert {r.x for r in rows} == {"narcissus"}


def test_all_constant_pattern_acts_as_ask(g):
    # no variables at all: one empty-schema row iff the triple exists
    assert bgp_match(g, [("alice", "knows", "bob")]).count() == 1
    assert bgp_match(g, [("alice", "knows", "carol")]).count() == 0


def test_disconnected_bgp_raises_without_opt_in(g):
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(
            g, [("?a", "knows", "?b"), ("?c", "in_country", "?d")]
        )
    n = bgp_match(
        g,
        [("?a", "knows", "?b"), ("?c", "in_country", "?d")],
        allow_product=True,
    ).count()
    assert n == 3 * 2  # knows-edges x in_country-edges


def test_distinct_vs_bag_semantics(spark):
    # two distinct paths produce the same binding: set semantics
    # collapses them, bag keeps both.
    g = spark.createDataFrame(
        [
            ("a", "r", "m1"),
            ("a", "r", "m2"),
            ("m1", "s", "z"),
            ("m2", "s", "z"),
        ],
        TRIPLE,
    )
    pats = [("?x", "r", "?m"), ("?m", "s", "?z")]
    proj = bgp_match(g, pats).select("x", "z").distinct()
    assert proj.count() == 1
    bag = bgp_match(g, pats, distinct=False).select("x", "z")
    assert bag.count() == 2


def test_validation_errors(g):
    with pytest.raises(ValueError, match="empty pattern"):
        bgp_match(g, [])
    with pytest.raises(ValueError, match="3 terms"):
        bgp_match(g, [("?a", "knows")])
    with pytest.raises(ValueError, match="empty variable"):
        bgp_match(g, [("?", "knows", "?b")])


def test_join_order_most_constrained_first(g):
    # the plan must start from the 2-constant pattern regardless of
    # its position in the list — verify via the compiled plan text:
    # the first scan filtered on BOTH pred and obj constants.
    df = bgp_match(
        g,
        [("?c", "lives_in", "?n"), ("?n", "in_country", "france")],
    )
    got = {(r.c, r.n) for r in df.collect()}
    assert got == {
        ("alice", "paris"),
        ("bob", "paris"),
        ("carol", "lyon"),
    }
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # constant filters are pushed into per-pattern Filters (never a
    # post-join filter on the constants)
    assert "in_country" in plan and "lives_in" in plan
