"""Trainable char-n-gram language ID (q58 carries the full DuckDB
train+score+argmax replay; these pin the classifier properties)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.langid_model import (
    char_ngrams,
    predict_lang,
    train_langid,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=lang, text=t) for i, lang, t in rows]
    )


def _corpus(spark):
    en = "the quick brown fox jumps over the lazy dog again and again"
    de = "der schnelle braune fuchs springt über den faulen hund wieder"
    rows = []
    for i in range(40):
        rows.append((i, "en" if i % 2 == 0 else "de", en if i % 2 == 0 else de))
    return _docs(spark, rows)


def test_predicts_heldout_correctly(spark):
    docs = _corpus(spark)
    model = train_langid(docs.filter("doc_id < 20"))
    preds = predict_lang(docs.filter("doc_id >= 20"), model).collect()
    assert len(preds) == 20
    for r in preds:
        assert r["pred_lang"] == ("en" if r["doc_id"] % 2 == 0 else "de")


def test_char_ngrams_short_text_excluded(spark):
    df = spark.createDataFrame([Row(t="ab"), Row(t="abc")])
    got = df.select(F.size(char_ngrams(F.col("t"), 3)).alias("n")).collect()
    assert sorted(r["n"] for r in got) == [0, 1]
    model = train_langid(
        _docs(spark, [(1, "x", "hello world of text")])
    )
    # a 2-char doc yields no grams -> no prediction row
    out = predict_lang(_docs(spark, [(9, "?", "ab")]), model)
    assert out.count() == 0


def test_tie_breaks_lexicographically(spark):
    # identical training text for both labels -> identical profiles;
    # every prediction ties and must resolve to the smaller lang
    docs = _docs(spark, [(1, "bb", "same text here"), (2, "aa", "same text here")])
    model = train_langid(docs)
    out = predict_lang(
        _docs(spark, [(7, "?", "same text here")]), model
    ).collect()
    assert out[0]["pred_lang"] == "aa"


def test_unseen_grams_hit_floor_not_crash(spark):
    model = train_langid(_docs(spark, [(1, "en", "aaaa bbbb cccc")]))
    out = predict_lang(_docs(spark, [(5, "?", "zzzz yyyy")]), model).collect()
    assert len(out) == 1 and out[0]["pred_lang"] == "en"
    assert out[0]["avg_logp"] < 0


def test_validates_params(spark):
    docs = _docs(spark, [(1, "en", "abc")])
    with pytest.raises(ValueError, match="smoothing k"):
        train_langid(docs, k=0)
    with pytest.raises(ValueError, match="n must be"):
        train_langid(docs, n=0)
