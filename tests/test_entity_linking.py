"""Entity linking (operators/entity_linking.py): exact + deletion-
neighborhood fuzzy link, recall-lossless at edit distance 1."""

import warnings

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from knowledge_harvest_from_lms_spark.operators.entity_linking import (
    link_entities,
)


def _link(spark, mentions, vertices):
    m = spark.createDataFrame([(x,) for x in mentions], "ent string")
    v = spark.createDataFrame(vertices, "vertex_id long, name string")
    return {r.ent: r for r in link_entities(m, v).collect()}


def test_exact_fuzzy_none_planted(spark):
    vertices = [(1, "Giraffe"), (2, "New York"), (3, "table")]
    got = _link(
        spark,
        [
            "giraffe",        # exact (case-normalized)
            "new  york",      # exact (whitespace-collapsed)
            "tabl",           # deletion typo → fuzzy
            "stable",         # insertion typo → fuzzy
            "tible",          # substitution typo → fuzzy
            "giraffes",       # insertion typo → fuzzy
            "zebra",          # far from everything → none
        ],
        vertices,
    )
    assert (got["giraffe"].vertex_id, got["giraffe"].method, got["giraffe"].dist) == (1, "exact", 0)
    assert (got["new  york"].vertex_id, got["new  york"].method) == (2, "exact")
    for typo in ("tabl", "stable", "tible"):
        assert (got[typo].vertex_id, got[typo].method, got[typo].dist) == (3, "fuzzy", 1), typo
    assert (got["giraffes"].vertex_id, got["giraffes"].method) == (1, "fuzzy")
    assert (got["zebra"].vertex_id, got["zebra"].method, got["zebra"].dist) == (None, "none", None)


def test_tie_break_deterministic(spark):
    # two vertices at the same distance: best = (dist, name asc, id asc)
    vertices = [(7, "cat"), (5, "bat")]
    got = _link(spark, ["hat"], vertices)
    assert (got["hat"].vertex_id, got["hat"].vertex_name) == (5, "bat")
    # same name twice → lowest id wins the exact stage
    got2 = _link(spark, ["cat"], [(9, "cat"), (4, "cat")])
    assert got2["cat"].vertex_id == 4


def test_one_row_per_mention_even_with_duplicate_mentions(spark):
    rows = _link(spark, ["cat", "cat", "dog"], [(1, "cat")])
    assert set(rows) == {"cat", "dog"}


def test_max_edit_guard(spark):
    m = spark.createDataFrame([("x",)], "ent string")
    v = spark.createDataFrame([(1, "x")], "vertex_id long, name string")
    with pytest.raises(ValueError):
        link_entities(m, v, max_edit=2)


@st.composite
def vocab_and_edit(draw):
    words = draw(
        st.lists(
            st.text(alphabet="abcdef", min_size=2, max_size=8),
            min_size=1, max_size=6, unique=True,
        )
    )
    base = draw(st.sampled_from(words))
    op = draw(st.sampled_from(["del", "sub", "ins", "same"]))
    i = draw(st.integers(0, max(len(base) - 1, 0)))
    ch = draw(st.sampled_from("abcdef"))
    if op == "del" and len(base) > 1:
        typo = base[:i] + base[i + 1:]
    elif op == "sub":
        typo = base[:i] + ch + base[i + 1:]
    elif op == "ins":
        typo = base[:i] + ch + base[i:]
    else:
        typo = base
    return words, typo


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ve=vocab_and_edit())
def test_edit1_mentions_always_link(spark, ve):
    """Recall property: any mention within edit distance 1 of SOME
    vertex must come back linked with dist<=1 (the deletion blocking
    may pick a different equally-close vertex, but never 'none')."""
    words, typo = ve
    got = _link(spark, [typo], list(enumerate(words)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert got[typo].method in ("exact", "fuzzy"), (typo, words)
        assert got[typo].dist <= 1
