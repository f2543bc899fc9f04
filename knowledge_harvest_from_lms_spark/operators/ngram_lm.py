"""Relational word-bigram language model for perplexity filtering.

CCNet filters Common-Crawl text by perplexity under a small n-gram LM
trained on a reference corpus (Wikipedia) — low-perplexity ≈
well-formed prose, high ≈ gibberish/boilerplate/menus. This module
is that filter with the LM itself expressed relationally: training
is two groupBy counts over the reference corpus, the "model" is a
DataFrame of add-k-smoothed conditional log-probs, and scoring is a
join — no external LM dependency, no Python in the hot path, and the
whole thing (train + score) replays in DuckDB (q54).

    P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V)

with V = reference vocabulary size (+1 for the unseen word class).
Unseen bigram w/ seen w1 → numerator k; unseen w1 → C(w1)=0. Scoring
left-joins doc bigrams against the model; per-doc
avg_logp = mean log P over bigram positions, ppl = exp(-avg_logp).

Scale shape: the bigram table is reference-corpus-sized, so the
score join is a shuffle equi-join on (w1, w2) — probe-side partial
aggregation first collapses each document's repeated bigrams, and
head bigrams ("of the" appearing in every document) are exactly the
skew AQE's OptimizeSkewedJoin splits; the model side has ONE row per
key, so splitting is lossless. Per-doc rollup is a second, uniform
shuffle on the id.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bigram_pairs(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent word pairs (split on " ")."""
    w = F.split(text, " ")
    cnt = F.size(w) - 1
    pairs = F.zip_with(
        F.slice(w, 1, cnt),
        F.slice(w, 2, cnt),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return F.when(F.size(w) >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


def train_bigram_lm(
    reference: DataFrame, text_col: str = "text", k: float = 0.5
) -> dict:
    """Fit the smoothed bigram model on a reference corpus.

    Returns {"bigrams": DF(w1, w2, logp), "unigrams": DF(w1, c1),
    "vocab_size": int, "k": float}. Two hash aggregates over the
    reference corpus; map-side partials absorb head-word skew.
    """
    if k <= 0:
        raise ValueError("smoothing k must be > 0")
    pairs = reference.select(
        F.explode(_bigram_pairs(F.col(text_col))).alias("p")
    ).select("p.w1", "p.w2")
    bigram_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    unigrams = pairs.groupBy("w1").agg(F.sum(F.lit(1)).alias("c1"))
    # +1: the unseen-word equivalence class shares one smoothed slot
    vocab_size = (
        reference.select(
            F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .agg(F.countDistinct("w"))
        .collect()[0][0]
        + 1
    )
    bigrams = bigram_counts.join(unigrams, "w1").select(
        "w1",
        "w2",
        F.round(
            F.log((F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k * vocab_size))),
            9,
        ).alias("logp"),
    )
    return {
        "bigrams": bigrams,
        "unigrams": unigrams,
        "vocab_size": int(vocab_size),
        "k": float(k),
    }


def score_perplexity(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, avg_logp, ppl) per document with >= 1 bigram.

    Unseen pairs fall back to the smoothed floor log(k / (c1 + k·V))
    (c1 = 0 when w1 itself is unseen) — computed in the join
    projection, so the model never materializes unseen rows.
    """
    k, V = model["k"], model["vocab_size"]
    pairs = docs.select(
        F.col(id_col),
        F.explode(_bigram_pairs(F.col(text_col))).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    # probe-side partial collapse: each doc's repeated bigrams join once
    probe = pairs.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = (
        probe.join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["unigrams"], "w1", "left")
        .select(
            F.col(id_col),
            F.col("n"),
            F.coalesce(
                F.col("logp"),
                F.round(
                    F.log(
                        F.lit(k)
                        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k * V))
                    ),
                    9,
                ),
            ).alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("n").cast("bigint").alias("n_bigrams"),
        F.round(F.sum(F.col("n") * F.col("logp")) / F.sum("n"), 6).alias(
            "avg_logp"
        ),
        F.round(F.exp(-F.sum(F.col("n") * F.col("logp")) / F.sum("n")), 4).alias(
            "ppl"
        ),
    )


def perplexity_filter(
    docs: DataFrame,
    model: dict,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents scoring ABOVE ``max_ppl`` (CCNet keeps the
    low-perplexity head/middle of the distribution).

    Implemented as an anti-join against the too-high set, so
    documents with no score row (fewer than two tokens — nothing to
    judge) PASS THROUGH: shortness is the Gopher gate's min_words
    rule, not this filter's job. (A semi-join on the kept set would
    silently destroy every short document regardless of threshold —
    review r4.)"""
    bad = score_perplexity(docs, model, id_col, text_col).filter(
        F.col("ppl") > max_ppl
    )
    return docs.join(bad.select(id_col), id_col, "left_anti")


def held_out_ppl(model: dict, docs: DataFrame, text_col: str = "text") -> float:
    """Corpus-level perplexity of ``docs`` under ``model`` — the
    standard fit diagnostic (driver-side scalar)."""
    row = (
        score_perplexity(
            docs.select(F.monotonically_increasing_id().alias("_i"), text_col),
            model,
            id_col="_i",
            text_col=text_col,
        )
        .agg(
            F.sum(F.col("avg_logp") * F.col("n_bigrams")).alias("lp"),
            F.sum("n_bigrams").alias("n"),
        )
        .collect()[0]
    )
    return float(math.exp(-row["lp"] / row["n"])) if row["n"] else float("inf")
