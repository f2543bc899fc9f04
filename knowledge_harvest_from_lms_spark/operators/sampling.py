"""Deterministic hash-based sampling and token-budget data mixing.

At 100 TB, `df.sample()` is the wrong tool for corpus curation: its
RNG draw is per-task, so retries, AQE re-planning, or a different
partition count change WHICH rows survive — a re-run of the "same"
pipeline trains on a different corpus. Hash-based sampling decides
per ROW from a stable key: `keep iff bucket(hash(key, seed)) <
rate*1000`. Same key + seed → same verdict on any cluster layout,
any retry, forever; disjoint seeds give independent samples; and the
predicate is a scan-fused projection — no shuffle, no RNG state.

Two hashers:
  * "xxhash64" (default) — Spark's JVM xxhash64, whole-stage codegen,
    the production path;
  * "portable" — the same polynomial rolling hash q16's fingerprint
    uses (acc*31 + byte mod 1e9+7), reproducible in DuckDB SQL, so
    sampling DECISIONS are oracle-checkable row-for-row (q50).
Bucketing is integer-only (hash mod 1000 vs rate in thousandths):
no float threshold edge can disagree between engines.

`token_budget_sample` composes this into the standard data-mixing
step: given per-stratum token totals (one small aggregate), derive
the per-stratum keep-rate that hits a token budget under target
mixture weights, then stratified-sample deterministically. The only
driver-side state is the stratum->rate dict (strata are few:
languages, sources), matching the repo's bounded-driver rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 1_000_000_007


def sample_bucket(key: Column, seed: int = 0, hasher: str = "xxhash64") -> Column:
    """Stable bucket in [0, 1000) for (key, seed) — the sampling
    decision variable. ``hasher="portable"`` matches the DuckDB
    replay in q50's oracle byte-for-byte."""
    if hasher == "xxhash64":
        h = F.xxhash64(key.cast("string"), F.lit(int(seed)))
        return F.pmod(h, F.lit(1000))
    if hasher == "portable":
        s = F.concat(key.cast("string"), F.lit(f"#{int(seed)}"))
        h = F.aggregate(
            F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * 31 + x) % _M,
        )
        return F.pmod(h, F.lit(1000))
    raise ValueError(f"unknown hasher {hasher!r} (xxhash64|portable)")


def _rate_millis(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(round(rate * 1000))


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    seed: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Keep ~rate of rows, decided per row by (key, seed) — stable
    across retries, partitionings and cluster sizes (module note)."""
    return df.filter(
        sample_bucket(F.col(key_col), seed, hasher) < F.lit(_rate_millis(rate))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    seed: int = 0,
    hasher: str = "xxhash64",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates).

    ``rates`` maps stratum value -> keep rate; strata absent from the
    map get ``default_rate`` (0.0 = drop unknown strata — the safe
    curation default; pass 1.0 to pass them through). The rate lookup
    compiles to a literal CASE chain (strata are few), so the whole
    filter stays a scan-fused codegen predicate — no join, no
    broadcast, no shuffle."""
    thresh = F.lit(_rate_millis(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(_rate_millis(rate))
        ).otherwise(thresh)
    return df.filter(sample_bucket(F.col(key_col), seed, hasher) < thresh)


def weighted_reservoir(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    group_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    Efraimidis-Spirakis A-ES reservoir, distributed: each row draws
    u from its stable hash and ranks by ln(u)/w (the log-monotone
    form of u^(1/w)); the k best per group are the sample, with
    inclusion probability proportional to weight. Because u comes
    from (key, seed) instead of an RNG, the SAME rows win on any
    partitioning, retry or cluster size (module note), and a SQL
    replay agrees row-for-row (q66).

    The rank-limit compiles to WindowGroupLimit with a map-side
    partial (the KMV plan shape): shuffle volume is ~k rows per
    partition per group. Rows with weight <= 0 or NULL are dropped
    (A-ES is defined for positive weights). Uses the avalanche hash
    from `operators/sketches` — lattice-free uniformity matters for
    order statistics (same lesson as the KMV estimator).
    """
    from pyspark.sql.window import Window as W

    from .sketches import _M, kmv_hash

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    group_cols = list(group_cols or [])
    u = (kmv_hash(F.col(key_col), seed, "portable") + 1) / F.lit(
        float(_M + 1)
    )
    score = F.round(
        F.log(u) / F.col(weight_col).cast("double"), 9
    )
    w = W.partitionBy(*group_cols).orderBy(
        F.desc("_sc"), F.asc(key_col)
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_sc", score)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .withColumnRenamed("_sc", "es_score")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    stratum_col: str,
    key_col: str,
    token_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 0,
    hasher: str = "xxhash64",
) -> tuple[DataFrame, dict[str, float]]:
    """Deterministic data mixing to a token budget.

    One small aggregate computes per-stratum token totals; the target
    mixture ``weights`` (default: proportional to the corpus) yield
    per-stratum keep-rates ``min(1, budget*w_s / tokens_s)``; rows
    are then stratified-sampled with those rates. Returns
    (sampled_df, rates) — persist the rates dict with the run config:
    it IS the sampling decision, and replaying it reproduces the
    corpus exactly.

    A stratum whose target exceeds its supply caps at rate 1.0 (you
    cannot mint tokens); the realized mixture then under-weights it —
    reported honestly via the returned rates rather than silently
    re-normalized, because re-balancing policy (upweight others?
    fail?) is the caller's call."""
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    if weights is None:
        grand = sum(totals.values()) or 1
        weights = {s: t / grand for s, t in totals.items()}
    else:
        wsum = sum(weights.values())
        if wsum <= 0:
            raise ValueError("weights must sum to > 0")
        weights = {s: w / wsum for s, w in weights.items()}
    rates = {
        s: min(1.0, (budget_tokens * weights.get(s, 0.0)) / t) if t else 0.0
        for s, t in totals.items()
    }
    return (
        stratified_sample(
            df, rates, stratum_col, key_col, seed=seed, hasher=hasher
        ),
        rates,
    )
