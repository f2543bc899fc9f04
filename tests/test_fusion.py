"""RRF fusion + Jaccard ranker (operators/fusion.py): fused scores
must equal the hand-computed RRF formula, consensus documents must
outrank single-ranker documents at equal ranks, and the gram builder
must survive degenerate text."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.fusion import (
    char_grams,
    jaccard_rank,
    rrf_fuse,
)


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rnk int")


def test_rrf_matches_formula(spark):
    a = _ranking(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranking(spark, [(2, 1), (4, 2)])
    out = {
        r.doc_id: (r.rrf, r.n_rankers)
        for r in rrf_fuse([a, b], k=60, top_n=10).collect()
    }
    assert out[2] == (round(1 / 62 + 1 / 61, 9), 2)
    assert out[1] == (round(1 / 61, 9), 1)
    assert out[4] == (round(1 / 62, 9), 1)
    assert out[3] == (round(1 / 63, 9), 1)


def test_consensus_beats_single(spark):
    # doc 7 is rank 5 in BOTH rankers; doc 1/2 are rank 1 in ONE —
    # with k=60, two mid ranks beat one top rank: 2/65 > 1/61.
    a = _ranking(spark, [(1, 1), (7, 5)])
    b = _ranking(spark, [(2, 1), (7, 5)])
    rows = rrf_fuse([a, b], k=60, top_n=10).collect()
    assert rows[0].doc_id == 7 and rows[0].rnk == 1


def test_rank_ties_break_on_id(spark):
    a = _ranking(spark, [(5, 1), (3, 2)])
    b = _ranking(spark, [(3, 1), (5, 2)])
    rows = rrf_fuse([a, b], k=60, top_n=10).collect()
    # identical rrf -> ascending doc_id order
    assert [r.doc_id for r in rows] == [3, 5]
    assert rows[0].rrf == rows[1].rrf


def test_top_n_truncates(spark):
    a = _ranking(spark, [(i, i) for i in range(1, 21)])
    assert rrf_fuse([a], top_n=5).count() == 5


def test_rrf_input_validation(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
    a = _ranking(spark, [(1, 1)])
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_jaccard_rank_orders_by_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "customer data small table"),  # identical -> jac 1.0
            (2, "customer data"),  # partial
            (3, "zzzzqqqq vvvv"),  # zero overlap -> omitted
        ],
        "doc_id long, text string",
    )
    rows = jaccard_rank(docs, "customer data small table").collect()
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].jac == 1.0 and rows[1].jac < 1.0


def test_char_grams_short_text_empty(spark):
    df = spark.createDataFrame([("ab",), ("abc",)], "t string")
    out = df.select(
        F.size(char_grams(F.col("t"), n=3)).alias("n")
    ).collect()
    assert sorted(r.n for r in out) == [0, 1]


def test_jaccard_query_too_short(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="shorter"):
        jaccard_rank(docs, "ab")
