"""Relational bigram LM + perplexity filter (q54 carries the full
train+score oracle replay; these pin semantics the oracle can't)."""

import math

import pytest
from pyspark.sql import Row

from knowledge_harvest_from_lms_spark.operators.ngram_lm import (
    held_out_ppl,
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)


def test_hand_computed_probabilities(spark):
    """ref = 'a b a b' twice: C(a,b)=4, C(b,a)=2, C1(a)=4, C1(b)=2
    (last token of each doc emits nothing), vocab = {a,b}+1 = 3."""
    ref = spark.createDataFrame([Row(text="a b a b"), Row(text="a b a b")])
    model = train_bigram_lm(ref, k=0.5)
    assert model["vocab_size"] == 3
    probs = {
        (r.w1, r.w2): r.logp for r in model["bigrams"].collect()
    }
    assert probs[("a", "b")] == round(math.log((4 + 0.5) / (4 + 1.5)), 9)
    assert probs[("b", "a")] == round(math.log((2 + 0.5) / (2 + 1.5)), 9)

    # score a doc with one seen and one UNSEEN bigram (b->z):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b z")])
    got = score_perplexity(docs, model).collect()[0]
    lp_ab = math.log(4.5 / 5.5)
    lp_bz = math.log(0.5 / (2 + 1.5))  # unseen pair, seen w1=b
    want = (round(lp_ab, 9) + round(lp_bz, 9)) / 2
    assert got.n_bigrams == 2
    assert got.avg_logp == round(want, 6)
    assert got.ppl == round(math.exp(-want), 4)

    # fully unseen w1 -> floor with c1 = 0
    got2 = score_perplexity(
        spark.createDataFrame([Row(doc_id=2, text="q r")]), model
    ).collect()[0]
    floor = math.log(0.5 / (0 + 1.5))
    assert got2.avg_logp == round(round(floor, 9), 6)


def test_filter_separates_gibberish(spark):
    """Documents made of reference-like bigrams score far lower ppl
    than shuffled-vocab gibberish — the CCNet separation property."""
    ref_rows = [
        Row(text="the cat sat on the mat and the dog sat on the rug")
    ] * 20
    ref = spark.createDataFrame(ref_rows)
    model = train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the rug"),
            Row(doc_id=2, text="rug the on mat cat dog sat the"),
        ]
    )
    ppl = {r.doc_id: r.ppl for r in score_perplexity(docs, model).collect()}
    assert ppl[1] < ppl[2] / 3  # clear margin, not a coin flip
    cut = (ppl[1] + ppl[2]) / 2
    kept = perplexity_filter(docs, model, max_ppl=cut)
    assert [r.doc_id for r in kept.collect()] == [1]


def test_single_word_docs_have_no_score(spark):
    ref = spark.createDataFrame([Row(text="a b c")])
    model = train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="solo"), Row(doc_id=2, text="a b")]
    )
    out = score_perplexity(docs, model).collect()
    assert [r.doc_id for r in out] == [2]  # no bigrams -> no row


def test_held_out_ppl_and_bad_k(spark):
    ref = spark.createDataFrame([Row(text="a b a b a b a c")] * 5)
    model = train_bigram_lm(ref)
    in_domain = spark.createDataFrame([Row(text="a b a b")])
    gibberish = spark.createDataFrame([Row(text="z q w e r t")])
    assert held_out_ppl(model, in_domain) < held_out_ppl(model, gibberish)
    with pytest.raises(ValueError, match="smoothing k"):
        train_bigram_lm(ref, k=0.0)


def test_filter_passes_unscoreable_docs(spark):
    """Docs with <2 tokens have nothing to judge and PASS (review
    r4): shortness is the quality gate's min_words rule, not the
    perplexity filter's."""
    ref = spark.createDataFrame([Row(text="a b c")])
    model = train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c"),
            Row(doc_id=2, text="solo"),
            Row(doc_id=3, text=""),
            Row(doc_id=4, text=None),
        ]
    )
    kept = perplexity_filter(docs, model, max_ppl=1e9)
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3, 4}
