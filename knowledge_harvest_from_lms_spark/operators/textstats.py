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


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------
# Rae et al. 2021 ("Scaling Language Models: ... Gopher", table A1) filter
# web documents on repetition: fraction of lines that are duplicates and
# fraction of characters in the most-frequent / in duplicated word
# n-grams.  Two operators, chosen by shape:
#
#   * line stats — lines per document are few (tens), so an O(L^2)
#     higher-order-function expression per row is cheaper than any
#     shuffle: fully shuffle-free, whole-stage-codegen-adjacent
#     (HOFs are interpreted but stay JVM-side, no Python).
#   * n-gram stats — grams per document scale with document length
#     (thousands), so the per-row O(G^2) HOF is the WRONG shape; we
#     explode grams in the projection and count through ONE wide
#     shuffle keyed (id, n, gram) whose map-side partial aggregation
#     absorbs within-document repetition, then roll up per (id, n) in
#     a second, much smaller shuffle.  This is the 100 TB shape: no
#     per-document quadratic work, skewed (head-gram) keys absorbed
#     by partials before the exchange.
#
# Exact semantics (documented because they are oracle-checked):
#   dup_line_frac       = duplicate line POSITIONS / total non-blank lines
#   dup_line_char_frac  = chars in lines whose text occurs >1 time / chars
#                         in all non-blank lines
#   top{n}gram char frac = occurrences(most frequent n-gram) * non-space
#                          chars of that gram / non-space chars of doc —
#                          may exceed 1.0 for overlapping grams (Gopher
#                          does not cap either)
#   dup{n}gram frac      = n-gram POSITIONS whose gram occurs >1 time /
#                          total n-gram positions (position-based, a
#                          documented divergence from Gopher's char-
#                          coverage variant, which needs per-position
#                          overlap resolution that neither SQL engine
#                          expresses sanely)
# Ties for the top gram break toward the lexicographically greatest
# gram so Spark's max(struct) and the oracle's ORDER BY agree.


def line_repetition_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append dup_line_frac / dup_line_char_frac (see module note).

    Shuffle-free: one pass, nested JVM higher-order functions over the
    per-row line array (O(L^2) per row — lines per doc are tens, and
    the alternative is an explode + two shuffles per document batch).
    Blank / whitespace-only lines are excluded before counting.
    """
    t = F.col(text_col)
    nonblank = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    lines = F.col("_lines")
    dups = F.filter(
        lines,
        lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1,
    )
    chars = lambda arr: F.aggregate(  # noqa: E731 — local expr builder
        arr, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    out = (
        df.withColumn("_lines", nonblank)
        .withColumn("_dup_lines", dups)
        .withColumns(
            {
                "dup_line_frac": F.when(
                    F.size(lines) > 0,
                    F.round(F.size(F.col("_dup_lines")) / F.size(lines), 4),
                ).otherwise(F.lit(0.0)),
                "dup_line_char_frac": F.when(
                    chars(lines) > 0,
                    F.round(chars(F.col("_dup_lines")) / chars(lines), 4),
                ).otherwise(F.lit(0.0)),
            }
        )
    )
    return out.drop("_lines", "_dup_lines")


def ngram_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Long-format per-document word-n-gram repetition stats.

    Returns (id, n, n_grams, top_gram, top_gram_count, top_char_frac,
    dup_gram_frac) — one row per document per n in `ns`; documents
    with fewer than n words contribute no row for that n.

    Scale shape (see module note): grams are built in the projection
    (slice over the split array — no Python), counted through one
    (id, n, gram) hash aggregate whose partials absorb within-doc
    repetition before the exchange, then rolled up per (id, n).
    Assumes single-space-separated text (split on " "), like the rest
    of this module.
    """
    t = F.col(text_col)
    w = F.split(t, " ")

    def _grams(n: int):
        # single-parameter lambda on purpose: a 2-arg lambda would be
        # read by F.transform as (element, index)
        def body(i):
            return F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(w, i, n)).alias("gram"),
            )

        return F.when(
            F.size(w) >= n,
            F.transform(F.sequence(F.lit(1), F.size(w) - (n - 1)), body),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))

    gram_arrays = [_grams(n) for n in ns]
    exploded = df.select(
        F.col(id_col),
        # non-space chars under the single-space assumption
        (F.length(t) - (F.size(w) - 1)).cast("bigint").alias("_tchars"),
        F.explode(F.flatten(F.array(*gram_arrays))).alias("_g"),
    ).select(id_col, "_tchars", F.col("_g.n").alias("n"), F.col("_g.gram").alias("gram"))
    counts = exploded.groupBy(id_col, "n", "gram").agg(
        F.count("*").alias("cnt"), F.first("_tchars").alias("_tchars")
    )
    top = F.col("_top")
    return (
        counts.groupBy(id_col, "n")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("_top"),
            F.coalesce(
                F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)
            ).alias("_dup"),
            F.first("_tchars").alias("_tchars"),
        )
        .select(
            F.col(id_col),
            F.col("n"),
            F.col("n_grams").cast("bigint").alias("n_grams"),
            top["gram"].alias("top_gram"),
            top["cnt"].cast("bigint").alias("top_gram_count"),
            F.round(
                top["cnt"] * (F.length(top["gram"]) - (F.col("n") - 1))
                / F.col("_tchars"),
                4,
            ).alias("top_char_frac"),
            F.round(F.col("_dup") / F.col("n_grams"), 4).alias("dup_gram_frac"),
        )
    )
