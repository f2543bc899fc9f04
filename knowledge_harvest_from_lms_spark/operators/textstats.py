"""Text-analysis transformers over a text column: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
Factored Column builders — the oracle-backed q16-q19 queries use the
same expressions, so what's tested is what's reused.

Everything is a JVM expression (whole-stage codegen); no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_MARKERS = ("the", "a", "of", "and", "is")


def words(text: Column) -> Column:
    return F.split(text, " ")


def en_marker_ratio(text: Column) -> Column:
    w = words(text)
    markers = F.size(F.filter(w, lambda x: x.isin(*EN_MARKERS)))
    return F.round(markers / F.size(w), 4)


def lang_pred(text: Column, threshold: float = 0.02) -> Column:
    return F.when(en_marker_ratio(text) > threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def token_count(text: Column) -> Column:
    return F.size(words(text))


# GPT-2-style pre-tokenizer approximation (contractions, letter runs,
# digit runs, punct runs — each optionally space-prefixed). ASCII
# classes only so the Java and DuckDB (RE2) regex engines agree.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Subword-ish token count via the BPE pre-tokenizer regex — the
    cheap LM-token estimator for training-data budgeting (whitespace
    counts undercount punctuation-heavy web text)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def type_token_ratio(text: Column) -> Column:
    w = words(text)
    return F.round(F.size(F.array_distinct(w)) / F.size(w), 4)


def avg_word_len(text: Column) -> Column:
    w = words(text)
    return F.round((F.length(text) - F.size(w) + 1) / F.size(w), 4)


def fingerprint(text: Column, prefix: int = 64) -> Column:
    """Portable polynomial rolling hash (matches the DuckDB oracle in
    plans/queries.py q16): acc = (acc*31 + ascii(c)) % 1e9+7."""
    head = F.substring(text, 1, prefix)
    return F.aggregate(
        F.transform(F.split(head, ""), lambda c: F.ascii(c).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Single-pass variant: the word split is materialized once and
    every stat derives from it (higher-order-function exprs are
    interpreted, so repeated splits are real per-row cost)."""
    t = F.col(text_col)
    w = F.col("_words")
    n = F.size(w)
    out = (
        df.withColumn("_words", words(t))
        .withColumns(
            {
                "n_tokens": n,
                "ttr": F.round(F.size(F.array_distinct(w)) / n, 4),
                "avg_word_len": F.round((F.length(t) - n + 1) / n, 4),
                "en_ratio": F.round(
                    F.size(F.filter(w, lambda x: x.isin(*EN_MARKERS))) / n, 4
                ),
                "fingerprint": fingerprint(t),
            }
        )
        .withColumn(
            "lang_pred",
            F.when(F.col("en_ratio") > 0.02, F.lit("en")).otherwise(F.lit("other")),
        )
    )
    return out.drop("_words")
