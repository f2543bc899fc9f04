"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling")
— pick raw-corpus documents that look like a small target corpus by
scoring each document under two hashed bag-of-n-grams language
models and resampling by the log importance ratio.

Relational shape (all three phases are standard aggregates):

  1. model fit    — word unigrams + bigrams hash into ``buckets``
     feature buckets; one groupBy(bucket) count per corpus. The
     fitted model is AT MOST ``buckets`` rows — a config constant
     (10^4..10^6), not data-scaled — so it broadcasts safely (the
     one place in this repo where an explicit broadcast hint is
     justified by construction, not by measurement).
  2. scoring      — the corpus feature stream joins the broadcast
     model (no shuffle) and one groupBy(doc) computes
     sum(n_f * (log p_target(f) - log p_raw(f))) — smoothed add-k
     over the bucket space, unseen buckets falling back to the
     closed-form floor. Per-bucket log-ratios round to 9 decimals
     and per-doc averages to 6, the q54-proven recipe that keeps
     float noise out of cross-engine hashes.
  3. resampling   — DSIR's Gumbel-top-k, made deterministic: the
     Gumbel noise derives from `sampling.sample_bucket`'s stable
     per-key hash (same key + seed -> same noise on any cluster
     layout), so the selected subset is reproducible forever —
     the same argument as hash-based sampling, applied to
     importance resampling. Selection is orderBy+limit, which
     Spark executes as TakeOrderedAndProject (per-partition top-n,
     no global sort materialization).

Two hashers, as in `sampling.py`: "xxhash64" (JVM codegen, the
production path) and "portable" (the polynomial 31-hash DuckDB can
replay — q57's oracle checks the whole fit+score pipeline
row-for-row).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .decontaminate import word_ngrams

_M = 1_000_000_007


def feature_bucket(gram: Column, buckets: int, hasher: str = "xxhash64") -> Column:
    """Stable feature bucket in [0, buckets) for a gram string."""
    if hasher == "xxhash64":
        return F.pmod(F.xxhash64(gram), F.lit(int(buckets)))
    if hasher == "portable":
        h = F.aggregate(
            F.transform(F.split(gram, ""), lambda c: F.ascii(c).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * 31 + x) % _M,
        )
        return F.pmod(h, F.lit(int(buckets)))
    raise ValueError(f"unknown hasher {hasher!r} (xxhash64|portable)")


def _feature_grams(text: Column) -> Column:
    """Unigram + bigram feature stream (the DSIR feature space)."""
    return F.concat(word_ngrams(text, 1), word_ngrams(text, 2))


def hashed_ngram_counts(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(bucket, n) counts of hashed unigram+bigram features — the
    fitted bag-of-hashed-ngrams model, <= ``buckets`` rows."""
    return (
        docs.select(
            F.explode(_feature_grams(F.col(text_col))).alias("gram")
        )
        .select(feature_bucket(F.col("gram"), buckets, hasher).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def dsir_log_ratio(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    k: float = 0.5,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id, n_feats, avg_log_ratio) for every document in ``docs``:
    the per-feature average of log p_target(f) - log p_raw(f) under
    add-k-smoothed hashed-ngram models fitted on ``target`` and
    ``raw`` (default: ``docs`` itself). Documents whose feature
    stream is empty are not returned (no features, no score)."""
    if raw is None:
        raw = docs
    tc = hashed_ngram_counts(target, text_col, buckets, hasher)
    rc = hashed_ngram_counts(raw, text_col, buckets, hasher)
    totals = (
        tc.agg(F.coalesce(F.sum("n"), F.lit(0)).cast("double").alias("t_tot"))
        .crossJoin(
            rc.agg(
                F.coalesce(F.sum("n"), F.lit(0)).cast("double").alias("r_tot")
            )
        )
    )
    kb = float(k) * float(buckets)
    model = (
        tc.withColumnRenamed("n", "t_n")
        .join(rc.withColumnRenamed("n", "r_n"), "bucket", "full_outer")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("t_n"), F.lit(0)) + F.lit(float(k)))
                    / (F.col("t_tot") + F.lit(kb))
                )
                - F.log(
                    (F.coalesce(F.col("r_n"), F.lit(0)) + F.lit(float(k)))
                    / (F.col("r_tot") + F.lit(kb))
                ),
                9,
            ).alias("logr"),
        )
    )
    probe = (
        docs.select(
            F.col(id_col),
            F.explode(_feature_grams(F.col(text_col))).alias("gram"),
        )
        .select(
            id_col, feature_bucket(F.col("gram"), buckets, hasher).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    floor = F.round(
        F.log(F.lit(float(k)) / (F.col("t_tot") + F.lit(kb)))
        - F.log(F.lit(float(k)) / (F.col("r_tot") + F.lit(kb))),
        9,
    )
    scored = (
        probe.join(F.broadcast(model), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col, "n", F.coalesce(F.col("logr"), floor).alias("logr")
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("n").cast("bigint").alias("n_feats"),
        F.round(
            F.sum(F.col("n") * F.col("logr")) / F.sum("n"), 6
        ).alias("avg_log_ratio"),
    )


def dsir_select(
    scores: DataFrame,
    n_keep: int,
    id_col: str = "doc_id",
    score_col: str = "avg_log_ratio",
    seed: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Gumbel-top-k resampling over importance scores, deterministic:
    the per-document uniform derives from `sampling.sample_bucket`
    (midpoint of the stable 1000-bucket hash), so g = -ln(-ln(u)) is
    a pure function of (id, seed) and the selected subset reproduces
    on any cluster layout. Ties break on id. Returns the input rows
    plus the ``gumbel_key`` used for selection."""
    from .sampling import sample_bucket

    if n_keep < 1:
        raise ValueError(f"n_keep must be >= 1, got {n_keep}")
    u = (
        sample_bucket(F.col(id_col), seed, hasher).cast("double") + F.lit(0.5)
    ) / F.lit(1000.0)
    key = F.round(F.col(score_col) - F.log(-F.log(u)), 9).alias("gumbel_key")
    return (
        scores.select("*", key)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(n_keep)
    )
