"""Distributed BPE training: exact merge-table parity with the
in-process reference trainer (lm/fake_tokenizers._train_bpe)."""

from collections import Counter

import pytest
from pyspark.sql import Row

from knowledge_harvest_from_lms_spark.lm.fake_tokenizers import (
    _GPT2_SPLIT,
    _pretoken_counts,
    _train_bpe,
    _training_texts,
)
from knowledge_harvest_from_lms_spark.operators.bpe_trainer import (
    pretoken_counts,
    train_bpe_distributed,
)


def _df(spark, texts):
    return spark.createDataFrame([Row(text=t) for t in texts])


def test_pretoken_counts_match_python(spark):
    texts = _training_texts()
    got = Counter(
        {r["pretoken"]: r["c"] for r in pretoken_counts(_df(spark, texts)).collect()}
    )
    assert got == _pretoken_counts(texts)


def test_merge_table_parity_fixture_corpus(spark):
    """The flagship contract: element-for-element merge-table equality
    with the single-process trainer on the fixture training corpus —
    counts, lexical tie-breaks, left-to-right fusion, early stop all
    agree."""
    texts = _training_texts()
    want = _train_bpe(_pretoken_counts(texts), 40)
    got = train_bpe_distributed(_df(spark, texts), 40, checkpoint_every=8)
    assert got == want


def test_merge_table_parity_documents_table(spark):
    import pyarrow.parquet as pq

    texts = [
        str(t)
        for t in pq.read_table("/root/testdata/sf0.001/documents.parquet")
        .column("text")
        .to_pylist()[:80]
    ]
    want = _train_bpe(_pretoken_counts(texts), 24)
    got = train_bpe_distributed(_df(spark, texts), 24)
    assert got == want


def test_early_stop_when_no_pairs_left(spark):
    # single-char pretokens only -> zero possible merges
    got = train_bpe_distributed(_df(spark, ["a b c", "b c a"]), 10)
    # " b" and " c" style pretokens DO have (Ġ, char) pairs; after
    # those fuse nothing of length >= 2 remains
    want = _train_bpe(_pretoken_counts(["a b c", "b c a"]), 10)
    assert got == want
    assert len(got) < 10


def test_tie_break_is_lexical(spark):
    # "xy" and "xz" both appear twice -> counts tie; (x,y) < (x,z)
    texts = ["xy xy xz xz"]
    want = _train_bpe(_pretoken_counts(texts), 3)
    got = train_bpe_distributed(_df(spark, texts), 3)
    assert got == want


def test_validates_n_merges(spark):
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe_distributed(_df(spark, ["a"]), -1)
