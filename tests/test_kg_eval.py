"""KG-completion evaluation (operators/kg_eval.py): filtered-rank
semantics — beat counting, deterministic tiebreak, known-competitor
removal, unscored-true handling — and the MRR/Hits@k fold."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.kg_eval import (
    filtered_ranks,
    ranking_metrics,
)

CAND = "subj string, pred string, obj string, score double"
TRIPLE = "subj string, pred string, obj string"


def _ranks(df):
    return {
        (r.subj, r.pred, r.obj): (r.true_score, r.rank)
        for r in df.collect()
    }


def test_rank_counts_strictly_better_competitors(spark):
    cand = spark.createDataFrame(
        [
            ("s", "p", "true", 5.0),
            ("s", "p", "a", 9.0),
            ("s", "p", "b", 7.0),
            ("s", "p", "c", 1.0),
        ],
        CAND,
    )
    test = spark.createDataFrame([("s", "p", "true")], TRIPLE)
    got = _ranks(filtered_ranks(cand, test))
    assert got == {("s", "p", "true"): (5.0, 3)}  # beaten by a, b


def test_tie_breaks_by_candidate_string_ascending(spark):
    # equal scores: candidates lexicographically SMALLER than the
    # true object rank ahead of it; larger ones do not.
    cand = spark.createDataFrame(
        [
            ("s", "p", "mmm", 5.0),
            ("s", "p", "aaa", 5.0),  # beats (smaller string)
            ("s", "p", "zzz", 5.0),  # does not
        ],
        CAND,
    )
    test = spark.createDataFrame([("s", "p", "mmm")], TRIPLE)
    got = _ranks(filtered_ranks(cand, test))
    assert got == {("s", "p", "mmm"): (5.0, 2)}


def test_filtered_setting_removes_known_true_competitors(spark):
    cand = spark.createDataFrame(
        [
            ("s", "p", "true", 5.0),
            ("s", "p", "other_true", 9.0),  # known -> filtered out
            ("s", "p", "noise", 7.0),
        ],
        CAND,
    )
    test = spark.createDataFrame([("s", "p", "true")], TRIPLE)
    known = spark.createDataFrame(
        [("s", "p", "true"), ("s", "p", "other_true")], TRIPLE
    )
    raw = _ranks(filtered_ranks(cand, test))
    filt = _ranks(filtered_ranks(cand, test, known))
    assert raw == {("s", "p", "true"): (5.0, 3)}
    assert filt == {("s", "p", "true"): (5.0, 2)}


def test_true_absent_from_candidates_yields_null_rank(spark):
    cand = spark.createDataFrame([("s", "p", "x", 1.0)], CAND)
    test = spark.createDataFrame([("s", "p", "unscored")], TRIPLE)
    got = _ranks(filtered_ranks(cand, test))
    assert got == {("s", "p", "unscored"): (None, None)}


def test_no_surviving_competitors_is_rank_one(spark):
    cand = spark.createDataFrame([("s", "p", "true", 1.0)], CAND)
    test = spark.createDataFrame([("s", "p", "true")], TRIPLE)
    got = _ranks(filtered_ranks(cand, test, known=test))
    assert got == {("s", "p", "true"): (1.0, 1)}


def test_duplicate_candidate_rows_collapse_to_max(spark):
    cand = spark.createDataFrame(
        [
            ("s", "p", "true", 5.0),
            ("s", "p", "dup", 3.0),
            ("s", "p", "dup", 8.0),  # max wins -> one beater
        ],
        CAND,
    )
    test = spark.createDataFrame([("s", "p", "true")], TRIPLE)
    got = _ranks(filtered_ranks(cand, test))
    assert got == {("s", "p", "true"): (5.0, 2)}


def test_ranking_metrics_fold(spark):
    ranks = spark.createDataFrame(
        [
            ("a", "p", "o", 1.0, 1),
            ("b", "p", "o", 1.0, 2),
            ("c", "p", "o", 1.0, 4),
            ("d", "p", "o", None, None),  # unscored -> miss at all k
        ],
        "subj string, pred string, obj string, "
        "true_score double, rank long",
    )
    row = ranking_metrics(ranks, ks=(1, 3)).collect()[0]
    assert row.n == 4
    assert row.mrr == pytest.approx((1.0 + 0.5 + 0.25 + 0.0) / 4, abs=1e-9)
    assert row.hits_1 == pytest.approx(0.25)
    assert row.hits_3 == pytest.approx(0.5)


def test_rank_is_partitioning_invariant(spark):
    # the q106/q111 determinism contract: shuffle layout cannot move
    # a rank — 1 partition vs 16 give identical tables.
    rows = [
        ("s%d" % (i % 7), "p", "o%d" % j, float((i * 13 + j * 7) % 23))
        for i in range(40)
        for j in range(25)
    ]
    cand = spark.createDataFrame(rows, CAND)
    test = spark.createDataFrame(
        [("s%d" % k, "p", "o%d" % (k * 3 % 25)) for k in range(7)], TRIPLE
    )
    a = _ranks(filtered_ranks(cand.coalesce(1), test))
    b = _ranks(filtered_ranks(cand.repartition(16), test))
    assert a == b
