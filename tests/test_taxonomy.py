"""Taxonomy induction (operators/taxonomy.py): best-parent argmax
with documented tiebreaks, mutual-edge resolution in every support
configuration, and composition with the Hearst miner."""

from knowledge_harvest_from_lms_spark.operators.taxonomy import (
    best_parents,
    induce_taxonomy,
)

SCHEMA = "hypo string, hyper string, n long"


def _isa(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _bp(spark, rows):
    return {
        r.child: (r.parent, r.n)
        for r in best_parents(_isa(spark, rows)).collect()
    }


def _tax(spark, rows):
    return {
        (r.child, r.parent): r.n
        for r in induce_taxonomy(_isa(spark, rows)).collect()
    }


def test_best_parent_by_support(spark):
    got = _bp(
        spark,
        [("apple", "fruit", 40), ("apple", "company", 25), ("pear", "fruit", 3)],
    )
    assert got == {"apple": ("fruit", 40), "pear": ("fruit", 3)}


def test_best_parent_tie_breaks_to_last(spark):
    got = _bp(spark, [("x", "aaa", 5), ("x", "bbb", 5)])
    assert got == {"x": ("bbb", 5)}


def test_mutual_pair_higher_support_wins(spark):
    got = _tax(
        spark,
        [("a", "b", 9), ("b", "a", 2), ("c", "a", 1)],
    )
    assert got == {("a", "b"): 9, ("c", "a"): 1}


def test_mutual_pair_equal_support_smaller_child_wins(spark):
    got = _tax(spark, [("a", "b", 4), ("b", "a", 4)])
    assert got == {("a", "b"): 4}


def test_non_mutual_edges_untouched(spark):
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    assert _tax(spark, rows) == {
        ("a", "b"): 1,
        ("b", "c"): 1,
        ("c", "d"): 1,
    }


def test_mutual_only_after_best_parent_selection(spark):
    # b's best parent is c, so (a<->b) is never a mutual pair in the
    # SELECTED forest even though raw triples contain both directions
    got = _tax(
        spark,
        [("a", "b", 5), ("b", "a", 3), ("b", "c", 7)],
    )
    assert got == {("a", "b"): 5, ("b", "c"): 7}


def test_composes_with_hearst(spark):
    from knowledge_harvest_from_lms_spark.operators.hearst import hearst_isa

    docs = spark.createDataFrame(
        [
            ("fruits such as apples and pears. fruits such as apples.",),
            ("companies such as apples.",),
        ],
        "text string",
    )
    got = {
        (r.child, r.parent): r.n
        for r in induce_taxonomy(hearst_isa(docs)).collect()
    }
    assert got == {
        ("apples", "fruits"): 2,
        ("pears", "fruits"): 1,
    }
