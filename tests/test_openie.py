"""ReVerb-style Open IE (operators/openie.py): the V P* relation
grammar corners — bare verb, bounded preposition runs, run overflow,
sentence boundaries, lexicon-subject rejection, self-pairs, and
multiplicity. Complements q103's independent positional-join oracle.
"""

from knowledge_harvest_from_lms_spark.operators.openie import open_ie

VERBS = ["married", "lives", "moved"]
PREPS = ["in", "to"]


def _docs(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _triples(spark, *texts, **kw):
    kw.setdefault("verbs", VERBS)
    kw.setdefault("preps", PREPS)
    rows = open_ie(_docs(spark, *texts), **kw).collect()
    return {(r.subj, r.pred, r.obj): r.n for r in rows}


def test_bare_verb(spark):
    assert _triples(spark, "alice married bob.") == {
        ("alice", "married", "bob"): 1
    }


def test_verb_plus_prep(spark):
    assert _triples(spark, "carol lives in paris.") == {
        ("carol", "lives in", "paris"): 1
    }


def test_two_prep_run(spark):
    assert _triples(spark, "dave moved in to rome.") == {
        ("dave", "moved in to", "rome"): 1
    }


def test_run_exceeding_bound_extracts_nothing(spark):
    assert _triples(spark, "eve moved in to to x.") == {}


def test_max_prep_run_parameter(spark):
    got = _triples(spark, "eve moved in to to x.", max_prep_run=3)
    assert got == {("eve", "moved in to to", "x"): 1}
    # bound 0: a preposition after the verb is already an overflow
    # (the object must be the first NON-prep token — 'in' never
    # becomes an object, it kills the candidate)
    assert _triples(spark, "carol lives in paris.", max_prep_run=0) == {}
    assert _triples(spark, "carol lives paris.", max_prep_run=0) == {
        ("carol", "lives", "paris"): 1
    }


def test_sentence_boundary_blocks_relation(spark):
    # verb at sentence end: no object on the other side of '.'
    assert _triples(spark, "alice married. bob cried.") == {}


def test_verb_at_sentence_start_has_no_subject(spark):
    assert _triples(spark, "married bob quickly.") == {}


def test_lexicon_subject_rejected(spark):
    # subj in verbs and subj in preps both reject
    assert _triples(spark, "married lives z. in lives q.") == {}


def test_self_pair_dropped(spark):
    assert _triples(spark, "frank married frank.") == {}


def test_counts_and_min_count(spark):
    texts = ["a married b. a married b.", "a married b. c lives in d."]
    got = _triples(spark, *texts)
    assert got == {
        ("a", "married", "b"): 3,
        ("c", "lives in", "d"): 1,
    }
    assert _triples(spark, *texts, min_count=2) == {
        ("a", "married", "b"): 3
    }


def test_chained_verbs_both_fire(spark):
    # non-overlapping by construction: each verb position is its own
    # candidate; "b" serves as obj of the first and subj of the second
    got = _triples(spark, "a married b married c.")
    assert got == {
        ("a", "married", "b"): 1,
        ("b", "married", "c"): 1,
    }


def test_case_folding_and_punct_tokenization(spark):
    got = _triples(spark, "Alice MARRIED Bob!  carol,lives,in,paris.")
    assert got == {
        ("alice", "married", "bob"): 1,
        ("carol", "lives in", "paris"): 1,
    }
