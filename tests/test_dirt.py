"""DIRT paraphrase discovery (operators/dirt.py): overlap counting
over distinct argument pairs, jaccard math, canonical orientation,
min_overlap gate, and composition with the Open IE miner."""

from knowledge_harvest_from_lms_spark.operators.dirt import (
    discover_paraphrases,
)

SCHEMA = "subj string, pred string, obj string, n long"


def _t(spark, rows):
    return spark.createDataFrame([r + (1,) for r in rows], SCHEMA)


def _pairs(spark, rows, **kw):
    return {
        (r.pred_a, r.pred_b): (r.overlap, round(r.jaccard, 6))
        for r in discover_paraphrases(_t(spark, rows), **kw).collect()
    }


def test_full_overlap_is_jaccard_one(spark):
    got = _pairs(
        spark,
        [("a", "married", "b"), ("a", "wed", "b"),
         ("c", "married", "d"), ("c", "wed", "d")],
    )
    assert got == {("married", "wed"): (2, 1.0)}


def test_partial_overlap_and_orientation(spark):
    got = _pairs(
        spark,
        [("a", "zz", "b"), ("a", "aa", "b"), ("c", "aa", "d")],
    )
    # one shared pair, sizes 1 and 2 -> jaccard 1/2; pred_a < pred_b
    assert got == {("aa", "zz"): (1, 0.5)}


def test_duplicate_triples_count_once(spark):
    got = _pairs(
        spark,
        [("a", "p", "b"), ("a", "p", "b"), ("a", "q", "b")],
    )
    assert got == {("p", "q"): (1, 1.0)}


def test_disjoint_predicates_absent_and_min_overlap(spark):
    rows = [
        ("a", "p", "b"), ("a", "q", "b"),
        ("c", "p", "d"), ("c", "q", "d"),
        ("e", "r", "f"),
    ]
    got = _pairs(spark, rows)
    assert got == {("p", "q"): (2, 1.0)}
    assert _pairs(spark, rows, min_overlap=3) == {}


def test_composes_with_open_ie(spark):
    from knowledge_harvest_from_lms_spark.operators.openie import open_ie

    docs = spark.createDataFrame(
        [
            ("alice married bob. alice wed bob.",),
            ("carol married dave. carol wed dave. carol knows eve.",),
        ],
        "text string",
    )
    mined = open_ie(docs, verbs=["married", "wed", "knows"], preps=[])
    got = {
        (r.pred_a, r.pred_b): (r.overlap, r.jaccard)
        for r in discover_paraphrases(mined).collect()
    }
    assert got == {("married", "wed"): (2, 1.0)}


# ---------------------------------------------------------------------------
# discover_inverses
# ---------------------------------------------------------------------------

def _inv(spark, rows, **kw):
    from knowledge_harvest_from_lms_spark.operators.dirt import (
        discover_inverses,
    )

    return {
        (r.pred_a, r.pred_b): (r.overlap, round(r.jaccard, 6), r.symmetric)
        for r in discover_inverses(_t(spark, rows), **kw).collect()
    }


def test_perfect_inverse_pair(spark):
    got = _inv(
        spark,
        [("a", "acquired", "b"), ("b", "sold_to", "a"),
         ("c", "acquired", "d"), ("d", "sold_to", "c")],
    )
    assert got == {("acquired", "sold_to"): (2, 1.0, False)}


def test_symmetric_predicate_diagonal(spark):
    # both orientations asserted for every pair -> fully symmetric:
    # intersection = {(a,b),(b,a),(c,d),(d,c)} (4), union = the same 4
    got = _inv(
        spark,
        [("a", "married", "b"), ("b", "married", "a"),
         ("c", "married", "d"), ("d", "married", "c")],
    )
    assert got == {("married", "married"): (4, 1.0, True)}


def test_partial_symmetry_fraction(spark):
    # (a,b) has its reverse, (c,d) does not: pairs = 3,
    # intersection = {(a,b),(b,a)} (2), jaccard = 2/(3+3-2) = 0.5
    got = _inv(
        spark,
        [("a", "likes", "b"), ("b", "likes", "a"), ("c", "likes", "d")],
    )
    assert got == {("likes", "likes"): (2, 0.5, True)}


def test_self_loop_matches_itself_once(spark):
    # (x, p, x) is its own swap -> diagonal overlap 1 over 1 pair
    got = _inv(spark, [("x", "p", "x")])
    assert got == {("p", "p"): (1, 1.0, True)}


def test_same_direction_predicates_not_inverses(spark):
    # q asserts the SAME direction as p -> paraphrase, not inverse:
    # no swapped overlap, and neither is symmetric
    got = _inv(spark, [("a", "p", "b"), ("a", "q", "b")])
    assert got == {}


def test_inverse_min_overlap_and_duplicates(spark):
    rows = [
        ("a", "p", "b"), ("a", "p", "b"),  # duplicate counts once
        ("b", "q", "a"),
        ("c", "p", "d"), ("d", "q", "c"),
    ]
    assert _inv(spark, rows) == {("p", "q"): (2, 1.0, False)}
    assert _inv(spark, rows, min_overlap=3) == {}
