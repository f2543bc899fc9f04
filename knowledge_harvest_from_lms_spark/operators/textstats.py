"""Text-analysis transformers over a text column: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
Factored Column builders — the oracle-backed q16-q19 queries use the
same expressions, so what's tested is what's reused.

Everything is a JVM expression (whole-stage codegen) except
`ngram_repetition_stats`, where MEASUREMENT picked an Arrow-batched
mapInPandas over both JVM formulations (see its docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
#   * n-gram stats — ALSO row-local (repetition is a per-document
#     property; nothing aggregates across documents), but grams per
#     document scale with length, so the winning implementation was
#     chosen by measurement across three candidates — exploded
#     (id, n, gram) hash-agg shuffle, row-local JVM HOF sort+scan,
#     Arrow-batched mapInPandas counter — see the function docstring
#     for the numbers.  Zero shuffle either way; at 100 TB the stage
#     is a pure map over (id, text) and scales with input splits.
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


def _unit_repetition_columns(
    df: DataFrame, text_col: str, sep: str, prefix: str
) -> DataFrame:
    """Shared kernel for line ("\\n") and paragraph ("\\n\\n") dup
    fractions: nested JVM higher-order functions over the per-row
    unit array (O(U^2) per row — units per doc are tens, and the
    alternative is an explode + two shuffles per document batch).
    Blank / space-only units are excluded before counting."""
    t = F.col(text_col)
    nonblank = F.filter(F.split(t, sep), lambda x: F.length(F.trim(x)) > 0)
    units = F.col("_units")
    dups = F.filter(
        units,
        lambda x: F.size(F.filter(units, lambda y: y == x)) > 1,
    )
    chars = lambda arr: F.aggregate(  # noqa: E731 — local expr builder
        arr, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    out = (
        df.withColumn("_units", nonblank)
        .withColumn("_dup_units", dups)
        .withColumns(
            {
                f"dup_{prefix}_frac": F.when(
                    F.size(units) > 0,
                    F.round(F.size(F.col("_dup_units")) / F.size(units), 4),
                ).otherwise(F.lit(0.0)),
                f"dup_{prefix}_char_frac": F.when(
                    chars(units) > 0,
                    F.round(chars(F.col("_dup_units")) / chars(units), 4),
                ).otherwise(F.lit(0.0)),
            }
        )
    )
    return out.drop("_units", "_dup_units")


def line_repetition_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append dup_line_frac / dup_line_char_frac (see module note)."""
    return _unit_repetition_columns(df, text_col, "\n", "line")


def paragraph_repetition_columns(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append dup_para_frac / dup_para_char_frac — Gopher's paragraph
    rules (paragraphs split on blank lines, "\\n\\n")."""
    return _unit_repetition_columns(df, text_col, "\n\n", "para")


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

    Scale shape (see module note): repetition is a PER-DOCUMENT
    property, so the computation is row-local — ZERO shuffle, an
    Arrow-batched mapInPandas over (id, text) only.  Implementation
    choice is MEASURED, not assumed (3M pages, ~190M grams, local[8]):

      * exploded (id, n, gram) hash aggregate: 190 s — the exchange
        carries ~190M mostly-distinct keys, the degenerate shuffle an
        all-keys-distinct aggregation always is;
      * row-local JVM higher-order functions (zip_with grams +
        array_sort + run-length `aggregate`): 218 s — HOFs are
        interpreted per element, ~550 µs/page of expression-tree
        walking;
      * this mapInPandas counter: **18 s** — "UDFs are the slow path"
        applies vs whole-stage codegen, NOT vs interpreted HOFs;
        Arrow batching + dict counting is 12x faster here.

    The final fractions are rounded JVM-side (F.round, HALF_UP) so
    Spark and the DuckDB oracle share rounding semantics — Python's
    round() is banker's rounding and would diverge on exact ties.
    Tie-break for the top gram is (count desc, gram desc); gram
    comparison agrees across Python/JVM/DuckDB for ASCII text (the
    tested regime — non-ASCII order may differ between UTF-16
    code-unit and code-point collation).
    Assumes single-space-separated text (split on " "), like the rest
    of this module.
    """
    from collections import Counter

    import pandas as pd

    ns_t = tuple(sorted({int(n) for n in ns}))
    id_field = df.schema[id_col]
    raw_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("n", T.IntegerType()),
            T.StructField("n_grams", T.LongType()),
            T.StructField("top_gram", T.StringType()),
            T.StructField("top_gram_count", T.LongType()),
            T.StructField("_top_frac", T.DoubleType()),
            T.StructField("_dup_frac", T.DoubleType()),
        ]
    )

    def gen(batches):
        cols = [
            id_col, "n", "n_grams", "top_gram", "top_gram_count",
            "_top_frac", "_dup_frac",
        ]
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                # NULL text arrives as None through Arrow — treat as
                # empty (dirty corpora are this operator's habitat)
                text = text or ""
                words = text.split(" ")
                n_words = len(words)
                tchars = len(text) - (n_words - 1)
                for n in ns_t:
                    if n_words < n:
                        continue
                    grams = [
                        " ".join(words[i : i + n])
                        for i in range(n_words - n + 1)
                    ]
                    counts = Counter(grams)
                    top, cnt = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
                    dup = sum(v for v in counts.values() if v > 1)
                    n_grams = len(grams)
                    out[id_col].append(did)
                    out["n"].append(n)
                    out["n_grams"].append(n_grams)
                    out["top_gram"].append(top)
                    out["top_gram_count"].append(cnt)
                    # raw IEEE doubles; rounding happens JVM-side.
                    # tchars == 0 on whitespace-only text (every
                    # token empty) — emit 0.0, never divide: one
                    # hostile doc must not kill the stage
                    out["_top_frac"].append(
                        cnt * (len(top) - (n - 1)) / tchars
                        if tchars > 0
                        else 0.0
                    )
                    out["_dup_frac"].append(dup / n_grams)
            yield pd.DataFrame(out)

    return (
        df.select(id_col, text_col)
        .mapInPandas(gen, raw_schema)
        .select(
            F.col(id_col),
            "n",
            "n_grams",
            "top_gram",
            "top_gram_count",
            F.round("_top_frac", 4).alias("top_char_frac"),
            F.round("_dup_frac", 4).alias("dup_gram_frac"),
        )
    )
