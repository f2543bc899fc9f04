"""Gopher quality gate: rule semantics, consistency with the
oracle-checked textstats operators, and the zero-shuffle plan."""

import random

import pytest
from pyspark.sql import Row

from knowledge_harvest_from_lms_spark.operators.quality_filter import (
    GOPHER_DEFAULTS,
    _doc_signals,
    gopher_quality_filter,
)


def _doc(words):
    return " ".join(words)


def test_rule_triggers(spark):
    good = _doc([f"word{i}" for i in range(60)])
    short = _doc(["tiny", "doc"])
    # 60 words, half of them "spam spam" repeats -> top-2gram blows up
    repeaty = _doc(["spam"] * 30 + [f"w{i}" for i in range(30)])
    symbols = _doc(["#tag"] * 30 + [f"w{i}" for i in range(30)])
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=good),
            Row(doc_id=1, text=short),
            Row(doc_id=2, text=repeaty),
            Row(doc_id=3, text=symbols),
        ]
    )
    rows = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert rows[0]["keep"] and rows[0]["failed_rules"] == []
    assert not rows[1]["keep"] and "min_words" in rows[1]["failed_rules"]
    assert not rows[2]["keep"]
    assert {"max_top_2gram_char_frac", "max_dup_5gram_frac"} <= set(
        rows[2]["failed_rules"]
    )
    assert not rows[3]["keep"] and "max_symbol_ratio" in rows[3]["failed_rules"]

    kept = gopher_quality_filter(df, keep_only=True).collect()
    assert [r["doc_id"] for r in kept] == [0]


def test_threshold_override_and_unknown_rule(spark):
    df = spark.createDataFrame([Row(doc_id=0, text=_doc(["a", "b", "c"]))])
    # min_words disabled -> the word-count rule no longer fires (the
    # top-n-gram rules still do on a 3-word doc: any unique bigram
    # covers >20% of it — exactly why Gopher pairs them with
    # min_words=50)
    out = gopher_quality_filter(
        df, thresholds={"min_words": None, "min_mean_word_len": None}
    ).collect()[0]
    assert "min_words" not in out["failed_rules"]
    assert "min_mean_word_len" not in out["failed_rules"]
    assert "max_top_2gram_char_frac" in out["failed_rules"]
    baseline = gopher_quality_filter(df).collect()[0]
    assert "min_words" in baseline["failed_rules"]
    with pytest.raises(ValueError, match="unknown quality rules"):
        gopher_quality_filter(df, thresholds={"max_typo_frac": 1.0})


def test_signals_match_textstats_operators(spark):
    """The composed gate recomputes what line_repetition_columns and
    ngram_repetition_stats compute (those are oracle-checked); the
    two paths must agree on random documents."""
    from knowledge_harvest_from_lms_spark.operators.textstats import (
        line_repetition_columns,
        ngram_repetition_stats,
    )

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "y2"]
    docs = []
    for i in range(25):
        lines = [
            _doc(rng.choices(vocab, k=rng.randint(2, 8)))
            for _ in range(rng.randint(1, 5))
        ]
        if rng.random() < 0.5:
            lines.append(lines[0])  # force a duplicate line sometimes
        docs.append(Row(doc_id=i, text="\n".join(lines)))
    df = spark.createDataFrame(docs)

    gate = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    line = {r["doc_id"]: r for r in line_repetition_columns(df).collect()}
    for i in gate:
        assert round(gate[i]["dup_line_frac"], 4) == line[i]["dup_line_frac"]
        assert (
            round(gate[i]["dup_line_char_frac"], 4)
            == line[i]["dup_line_char_frac"]
        )

    # n-gram fractions: textstats splits on " " over the WHOLE text
    # (single-space assumption), so compare on single-line docs only
    flat = spark.createDataFrame(
        [Row(doc_id=r["doc_id"], text=r["text"].replace("\n", " ")) for r in docs]
    )
    gate_flat = {r["doc_id"]: r for r in gopher_quality_filter(flat).collect()}
    ng = {
        (r["doc_id"], r["n"]): r
        for r in ngram_repetition_stats(flat, ns=(2, 3)).collect()
    }
    for i in gate_flat:
        for n in (2, 3):
            if (i, n) in ng:
                assert (
                    round(gate_flat[i][f"top_{n}gram_char_frac"], 4)
                    == ng[(i, n)]["top_char_frac"]
                )


def test_defaults_are_gopher_table_a1():
    assert GOPHER_DEFAULTS["min_words"] == 50
    assert GOPHER_DEFAULTS["max_top_2gram_char_frac"] == 0.20
    assert GOPHER_DEFAULTS["max_top_3gram_char_frac"] == 0.18
    assert GOPHER_DEFAULTS["max_top_4gram_char_frac"] == 0.16


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([Row(doc_id=0, text=_doc(["a"] * 60))])
    plan = gopher_quality_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_doc_signals_edge_cases():
    sig = _doc_signals("")
    assert sig["n_words"] == 1  # ''.split(' ') -> ['']
    assert sig["alpha_word_frac"] == 0.0
    sig = _doc_signals("a a a a")
    assert sig["top_2gram_char_frac"] > 1.0  # overlap, documented


def test_gate_hostile_docs_total(spark):
    """NULL text and whitespace-only text go through the gate without
    crashing (review r4); they fail min_words/alpha rules, they don't
    fail the JOB."""
    df = spark.createDataFrame(
        [Row(doc_id=0, text=None), Row(doc_id=1, text="   ")]
    )
    rows = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert not rows[0]["keep"] and not rows[1]["keep"]
    assert rows[0]["failed_rules"]  # defined verdicts, not exceptions


def test_tab_only_lines_consistent_with_textstats(spark):
    """strip(' ') vs F.trim alignment (review r4): a duplicated
    tab-only line is non-blank in BOTH operators, so dup-line signals
    agree."""
    from knowledge_harvest_from_lms_spark.operators.textstats import (
        line_repetition_columns,
    )

    df = spark.createDataFrame([Row(doc_id=0, text="a\n\t\n\t\nb")])
    gate = gopher_quality_filter(df).collect()[0]
    ts = line_repetition_columns(df).collect()[0]
    assert round(gate["dup_line_frac"], 4) == ts["dup_line_frac"] == 0.5


def test_paragraph_rules_in_gate(spark):
    """Gopher's dup-paragraph rules fire in the gate and agree with
    paragraph_repetition_columns."""
    from knowledge_harvest_from_lms_spark.operators.textstats import (
        paragraph_repetition_columns,
    )

    filler = " ".join(f"w{i}" for i in range(30))
    text = f"{filler}\n\n{filler}\n\nunique tail paragraph"
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    gate = gopher_quality_filter(df).collect()[0]
    ts = paragraph_repetition_columns(df).collect()[0]
    assert round(gate["dup_para_frac"], 4) == ts["dup_para_frac"]
    assert round(gate["dup_para_char_frac"], 4) == ts["dup_para_char_frac"]
    assert "max_dup_para_frac" in gate["failed_rules"]
    assert "max_dup_para_char_frac" in gate["failed_rules"]
