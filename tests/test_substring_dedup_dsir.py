"""Exact-substring span dedup (Lee et al. 2021) + DSIR importance
resampling (q56/q57 carry the full DuckDB replays; these pin the
properties the oracles can't: hash-key equivalence, first-occurrence
semantics, span merging, selection determinism)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.dsir import (
    dsir_log_ratio,
    dsir_select,
    hashed_ngram_counts,
)
from knowledge_harvest_from_lms_spark.operators.substring_dedup import (
    dedup_substrings,
    duplicated_gram_positions,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _texts(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def test_substring_dedup_keeps_first_occurrence(spark):
    shared = "one two three four five"
    docs = _docs(
        spark,
        [
            (1, f"alpha start {shared} tail one"),
            (2, f"beta opening {shared} other end"),
            (3, "gamma totally unique words here throughout"),
        ],
    )
    out = _texts(dedup_substrings(docs, k=5, min_count=2))
    # doc 1 holds the globally first occurrence -> untouched
    assert out[1] == f"alpha start {shared} tail one"
    # doc 2 loses exactly the shared 5-token span
    assert out[2] == "beta opening other end"
    assert out[3] == "gamma totally unique words here throughout"


def test_substring_dedup_merges_overlapping_spans(spark):
    # a 7-token shared run = three overlapping duplicated 5-grams;
    # removal must be their union (all 7 tokens), not 3*5 double-counts
    shared = "a b c d e f g"
    docs = _docs(
        spark, [(1, f"{shared} x"), (2, f"y {shared} z")]
    )
    rows = {
        r["doc_id"]: r
        for r in dedup_substrings(docs, k=5, min_count=2).collect()
    }
    assert rows[1]["n_tokens_removed"] == 0
    assert rows[2]["text"] == "y z"
    assert rows[2]["n_tokens_removed"] == 7
    assert rows[2]["n_tokens_kept"] == 2


def test_substring_dedup_short_docs_untouched(spark):
    docs = _docs(spark, [(1, "same words"), (2, "same words")])
    out = dedup_substrings(docs, k=5, min_count=2)
    assert {r["n_tokens_removed"] for r in out.collect()} == {0}


def test_substring_dedup_fully_duplicated_doc_row_preserved(spark):
    shared = "p q r s t"
    docs = _docs(spark, [(1, shared), (2, shared)])
    rows = {
        r["doc_id"]: r
        for r in dedup_substrings(docs, k=5, min_count=2).collect()
    }
    assert rows[1]["text"] == shared
    assert rows[2]["text"] == "" and rows[2]["n_tokens_kept"] == 0


def test_substring_dedup_hash_equals_string_keys(spark):
    docs = _docs(
        spark,
        [
            (i, f"prefix {i} common shared run of words number {i % 3} "
                f"suffix piece {i * 7 % 5}")
            for i in range(20)
        ],
    )
    a = dedup_substrings(docs, k=4, min_count=2, hash_grams=True)
    b = dedup_substrings(docs, k=4, min_count=2, hash_grams=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_duplicated_gram_positions_excludes_winner(spark):
    shared = "u v w x y"
    docs = _docs(spark, [(5, f"{shared} m"), (2, f"n {shared}")])
    got = duplicated_gram_positions(docs, k=5, min_count=2).collect()
    # winner is (2, 1) (min doc_id); only doc 5's occurrence flagged
    assert [(r["doc_id"], r["pos"]) for r in got] == [(5, 0)]


def test_substring_dedup_validates_params(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="min_count"):
        dedup_substrings(docs, min_count=1)
    with pytest.raises(ValueError, match="k must be"):
        duplicated_gram_positions(docs, k=0)


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

def _corpus(spark):
    sci = "the experiment measured quantum decay rates in the detector"
    web = "click here to win a free prize now limited offer"
    rows = [(i, sci if i % 2 == 0 else web) for i in range(40)]
    return _docs(spark, rows)


def test_dsir_scores_target_like_docs_higher(spark):
    docs = _corpus(spark)
    target = docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 10))
    scores = {
        r["doc_id"]: r["avg_log_ratio"]
        for r in dsir_log_ratio(docs, target, buckets=256).collect()
    }
    sci_scores = [v for k, v in scores.items() if k % 2 == 0]
    web_scores = [v for k, v in scores.items() if k % 2 == 1]
    assert min(sci_scores) > max(web_scores)


def test_dsir_hash_backends_agree_on_ordering(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    for hasher in ("xxhash64", "portable"):
        out = dsir_log_ratio(docs, target, buckets=256, hasher=hasher)
        scores = {r["doc_id"]: r["avg_log_ratio"] for r in out.collect()}
        assert min(
            v for k, v in scores.items() if k % 2 == 0
        ) > max(v for k, v in scores.items() if k % 2 == 1)


def test_dsir_n_feats_is_unigram_plus_bigram_count(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "solo")])
    target = docs
    out = {
        r["doc_id"]: r["n_feats"]
        for r in dsir_log_ratio(docs, target, buckets=64).collect()
    }
    assert out[1] == 5  # 3 unigrams + 2 bigrams
    assert out[2] == 1  # 1 unigram, no bigram


def test_dsir_select_deterministic_and_sized(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    scores = dsir_log_ratio(docs, target, buckets=256)
    a = dsir_select(scores, n_keep=10, seed=7)
    b = dsir_select(scores, n_keep=10, seed=7)
    ids_a = [r["doc_id"] for r in a.collect()]
    ids_b = [r["doc_id"] for r in b.collect()]
    assert ids_a == ids_b and len(ids_a) == 10
    # gumbel noise is bounded for 1000 buckets; target-heavy corpus
    # means mostly-even doc_ids survive
    assert sum(1 for i in ids_a if i % 2 == 0) >= 8
    with pytest.raises(ValueError, match="n_keep"):
        dsir_select(scores, n_keep=0)


def test_dsir_model_bounded_by_buckets(spark):
    docs = _corpus(spark)
    counts = hashed_ngram_counts(docs, buckets=16)
    rows = counts.collect()
    assert len(rows) <= 16
    assert all(0 <= r["bucket"] < 16 for r in rows)
    total = sum(r["n"] for r in rows)
    # per doc: n_words unigrams + (n_words - 1) bigrams
    expect = sum(
        2 * len(r["text"].split(" ")) - 1 for r in docs.collect()
    )
    assert total == expect


def test_dsir_floor_applies_to_unseen_buckets(spark):
    # score a doc whose features appear in NEITHER model: its per-
    # feature log-ratio is the closed-form floor ln(r_tot+kB)-ln(t_tot+kB)
    train = _docs(spark, [(1, "aa bb"), (2, "cc dd")])
    probe = _docs(spark, [(9, "zz yy xx")])
    out = dsir_log_ratio(
        probe, train.filter("doc_id = 1"), train.filter("doc_id = 2"),
        buckets=4096, k=0.5,
    ).collect()
    kb = 0.5 * 4096
    floor = round(
        round(math.log(0.5 / (3 + kb)) - math.log(0.5 / (3 + kb)), 9), 6
    )
    assert len(out) == 1 and out[0]["avg_log_ratio"] == pytest.approx(floor)
