"""Trainable char-n-gram language identification — the CLD/fastText
langid family, expressed relationally. `textstats.lang_pred` is a
fixed marker-word heuristic; this module LEARNS per-language
character-n-gram profiles from a labeled slice and classifies by
naive-Bayes log-likelihood — the standard production langid shape
(langid.py, CLD2 train char-n-gram profiles exactly this way).

    P(gram | lang) = (C(lang, gram) + k) / (C(lang) + k·V)
    pred(doc) = argmax_lang Σ_g n_g · log P(g | lang)

with V = distinct grams corpus-wide (+1 unseen class), mirroring
`ngram_lm`'s smoothing conventions so the whole train+score+argmax
path replays in DuckDB (q58).

Scale shape: training is one groupBy(lang, gram) count over the
labeled reference (map-side partials absorb head grams) plus a
lang-sized totals dim. Scoring crosses each document's DISTINCT gram
counts with the language dim (|langs| is a handful — a bounded
constant fan-out, not a data-scaled blowup), left-joins the model on
(lang, gram) with the smoothed floor in the join projection, and
rolls up per (doc, lang); the argmax is a per-doc window (uniform
key). Langs-totals and the model are reference-bounded; AQE picks
the join strategy (totals stay unhinted — same rationale as the
rerank totals join, ADVICE r3)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def char_ngrams(text: Column, n: int = 3) -> Column:
    """array<string> of overlapping char n-grams (empty when the text
    is shorter than n)."""
    length = F.length(text)
    grams = F.transform(
        F.sequence(F.lit(1), length - F.lit(n - 1)),
        lambda i: text.substr(i, F.lit(n)),
    )
    return F.when(length >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def train_langid(
    reference: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    k: float = 0.5,
) -> dict:
    """Fit per-language char-n-gram profiles on a labeled reference.

    Returns {"profiles": DF(lang, gram, logp), "totals": DF(lang,
    c_lang), "vocab_size": int, "k": float, "n": int}."""
    if k <= 0:
        raise ValueError("smoothing k must be > 0")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = reference.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
    )
    # ONE raw-reference scan: totals and vocab_size derive from the
    # (lang, gram) counts aggregate — a vocab-bounded table, eagerly
    # localCheckpointed because it feeds three consumers (the same
    # partials-reuse discipline as operators/rollup.py; without it,
    # Catalyst re-runs the explode+aggregate per consumer)
    counts = (
        grams.groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("c_lg"))
        .localCheckpoint()
    )
    totals = counts.groupBy("lang").agg(F.sum("c_lg").alias("c_lang"))
    vocab_size = counts.select("gram").distinct().count() + 1
    profiles = counts.join(totals, "lang").select(
        "lang",
        "gram",
        F.round(
            F.log(
                (F.col("c_lg") + F.lit(k))
                / (F.col("c_lang") + F.lit(k * vocab_size))
            ),
            9,
        ).alias("logp"),
    )
    return {
        "profiles": profiles,
        "totals": totals,
        "vocab_size": int(vocab_size),
        "k": float(k),
        "n": int(n),
    }


def predict_lang(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pred_lang, avg_logp, n_grams) per document with >= 1 gram:
    the naive-Bayes argmax over the trained profiles. Ties break on
    lang ascending (deterministic, replayed by the oracle's
    ROW_NUMBER)."""
    k, V, n = model["k"], model["vocab_size"], model["n"]
    probe = (
        docs.select(
            F.col(id_col),
            F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("n_g"))
    )
    langs = model["totals"]
    # bounded fan-out: |langs| rows per distinct (doc, gram)
    crossed = probe.crossJoin(F.broadcast(langs.select("lang", "c_lang")))
    floor = F.round(
        F.log(F.lit(k) / (F.col("c_lang") + F.lit(k * V))), 9
    )
    scored = (
        crossed.join(model["profiles"], ["lang", "gram"], "left")
        .select(
            F.col(id_col),
            "lang",
            "n_g",
            F.coalesce(F.col("logp"), floor).alias("logp"),
        )
        .groupBy(id_col, "lang")
        .agg(
            F.sum("n_g").alias("n_grams"),
            F.round(F.sum(F.col("n_g") * F.col("logp")) / F.sum("n_g"), 6)
            .alias("avg_logp"),
        )
    )
    pick = Window.partitionBy(id_col).orderBy(
        F.desc("avg_logp"), F.asc("lang")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            id_col,
            F.col("lang").alias("pred_lang"),
            "avg_logp",
            F.col("n_grams").cast("bigint").alias("n_grams"),
        )
    )
