"""PMI collocation mining — corpus-scale phrase discovery.

Phrase vocabulary induction (the word2vec-phrases / AutoPhrase move)
needs the corpus's statistically-glued adjacent word pairs: bigrams
whose observed rate beats the independence assumption. Pointwise
mutual information over adjacent-bigram occurrences:

    pmi(a, b) = ln( (c(a,b) / N_bi) / ((c(a) / N_uni) * (c(b) / N_uni)) )

with c(a,b) = adjacent-bigram count, c(w) = token occurrence count,
N_bi / N_uni the corpus totals. All counts are exact integers and the
single ``ln`` happens once at publication (rounded at 9), so a DuckDB
oracle replays the whole computation hash-exactly (q83).

Plan shape — the scale decisions:

* Tokenization is the portable JVM convention (lower, split on
  non-alnum runs) — one projection, no Python.
* Bigram extraction is ``arrays_zip`` of the token array against its
  own 1-shift — per-row array ops, rows explode ONCE into the bigram
  stream.
* Two hash aggregates (bigram counts, unigram counts) — both collapse
  map-side; the ``min_count`` filter applies to the bigram aggregate
  BEFORE the unigram join, so the heavy singleton tail (the vast
  majority of bigram types under Zipf) never reaches a join.
* The unigram side is vocabulary-bounded, but NOT broadcast-hinted:
  web-scale vocabularies (URLs, typos, numerals) overflow a broadcast;
  AQE picks broadcast when the filtered vocab actually fits.
* Final ``top_n`` is a bounded TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_TOKEN_EXTRACT = "[a-z0-9]+"  # shared with operators/bm25.py + oracles


def _tokens(text):
    # extraction (cached compiled pattern), not split-and-filter:
    # Spark's `split` recompiles its regex per row — the openie.py
    # finding; complement-class extraction == split minus empties
    return F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_EXTRACT), 0)


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Top-``top_n`` adjacent bigrams by PMI among those with
    ``c(a,b) >= min_count``: ``(w1, w2, c_ab, c_a, c_b, pmi, rnk)``,
    pmi rounded at 9, rank tie-broken on (w1, w2). ``min_count``
    guards the low-frequency PMI pathology (a 2-occurrence pair of
    rare words maxes PMI) and is what keeps the join input bounded."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = docs.select(_tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    # adjacent bigrams: zip toks[0:n-1] with toks[1:n-1]
    pairs = toks.filter(F.size("toks") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
            )
        ).alias("bg")
    )
    bi = (
        pairs.select(F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    totals = toks.agg(
        F.sum(F.size("toks")).alias("n_uni"),
        F.sum(F.greatest(F.size("toks") - 1, F.lit(0))).alias("n_bi"),
    )
    joined = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("c_ab").cast("double") / F.col("n_bi"))
        / (
            (F.col("c_a").cast("double") / F.col("n_uni"))
            * (F.col("c_b").cast("double") / F.col("n_uni"))
        )
    )
    scored = joined.select(
        "w1", "w2", "c_ab", "c_a", "c_b", F.round(pmi, 9).alias("pmi")
    )
    # top-n FIRST as a distributed TakeOrderedAndProject — a global
    # row_number window here would drag every surviving bigram type
    # into one partition; the window then ranks only the n survivors.
    top = scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(top_n)
    w = W.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return top.withColumn("rnk", F.row_number().over(w))
