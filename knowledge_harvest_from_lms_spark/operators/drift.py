"""Corpus drift detection: PSI / KL divergence between two corpus
snapshots on a numeric feature, over FIXED bucket edges.

The training-data-pipeline move this implements: before a new
Common-Crawl snapshot joins the training mix, compare its feature
distributions (document length, quality score, perplexity, token
count) against the currently-deployed corpus and gate the merge on
Population Stability Index thresholds (the standard monitoring rule
of thumb: PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

Scale design (the 100 TB lens):
- Each snapshot contributes ONE map-side-combining hash aggregate on
  a bounded bucket id (``len(edges)+1`` distinct groups) — partial
  aggregation collapses 10^12 rows to k rows per partition before
  the exchange; the shuffle moves O(k * partitions) counters.
- The two k-row per-bucket count sides join on a k-row bucket SPINE
  built from the edges literal (driver-bounded, like the packing
  offset broadcast) so buckets empty on one or both sides still emit
  a row — a vanished bucket is exactly the drift signal you cannot
  afford to drop.
- Bucketing compiles to a literal WHEN chain fused into the scan:
  no UDF, no shuffle, prunes to the feature column.

Determinism: counts are exact integers; smoothed fractions and the
PSI/KL terms are doubles ROUNDED AT 9 for publication (the repo
determinism rule), replayable in DuckDB with the identical smoothing
arithmetic (q77 oracle). Laplace smoothing ``(n + s) / (N + s*k)``
keeps every log finite without branching on zero buckets — a
branch-free formula both engines compute identically.

No reference counterpart (the reference pipeline has no corpus
monitoring); this extends the curation suite alongside
operators/quality_filter.py and operators/dsir.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketize(col, edges: Sequence[float]):
    """Column expr: bucket id in [0, len(edges)] for a numeric column
    against sorted interior edges — bucket i holds
    ``edges[i-1] <= x < edges[i]`` (first bucket: x < edges[0]; last:
    x >= edges[-1]). NULL feature -> NULL bucket (excluded upstream).
    A literal WHEN chain: scan-fused, no shuffle, no UDF."""
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(col < F.lit(float(edges[i])), F.lit(i)).otherwise(expr)
    return expr


def feature_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    feature: str,
    edges: Sequence[float],
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-bucket drift report between snapshot A (expected /
    reference) and snapshot B (actual / candidate) on ``feature``.

    Returns one row PER BUCKET (including buckets empty on either
    side): ``bucket`` (int), ``n_a``/``n_b`` (exact counts),
    ``frac_a``/``frac_b`` (Laplace-smoothed fractions, rounded 9),
    ``psi_term`` = (fa - fb) * ln(fa / fb) and ``kl_term`` =
    fa * ln(fa / fb), both rounded 9. Total PSI / KL = SUM over the
    rows (exactly k rows, k = len(edges)+1 — driver-safe to sum)."""
    if not edges or list(edges) != sorted(float(e) for e in edges):
        raise ValueError("edges must be a non-empty sorted sequence")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (keeps logs finite)")
    k = len(edges) + 1
    s = float(smoothing)
    spark = SparkSession.getActiveSession() or df_a.sparkSession

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.filter(F.col(feature).isNotNull())
            .select(bucketize(F.col(feature), edges).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    spine = spark.range(k).select(F.col("id").cast("int").alias("bucket"))
    ca, cb = counts(df_a, "raw_a"), counts(df_b, "raw_b")
    joined = (
        spine.join(F.broadcast(ca), "bucket", "left")
        .join(F.broadcast(cb), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("raw_a", F.lit(0)).alias("n_a"),
            F.coalesce("raw_b", F.lit(0)).alias("n_b"),
        )
    )
    # totals over k rows: a windowless cross-broadcast of the 1-row agg
    tot = joined.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    fa = (F.col("n_a") + F.lit(s)) / (F.col("tot_a") + F.lit(s * k))
    fb = (F.col("n_b") + F.lit(s)) / (F.col("tot_b") + F.lit(s * k))
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.round(fa, 9).alias("frac_a"),
            F.round(fb, 9).alias("frac_b"),
            F.round((fa - fb) * F.log(fa / fb), 9).alias("psi_term"),
            F.round(fa * F.log(fa / fb), 9).alias("kl_term"),
        )
    )
