"""Exponentially time-decayed aggregates — freshness-weighted stats.

Corpus freshness weighting (favor recent crawls when sampling),
trending-entity detection, and decayed engagement counts all need

    decayed_count(g)  = Σ_rows exp(-λ · (T_ref - t_row))
    decayed_sum(g, v) = Σ_rows v · exp(-λ · (T_ref - t_row))

— the classic half-life aggregate. It is a MONOID under a shared
reference time: partials from partitions / days / micro-batches add
(and a partial anchored at T1 re-anchors to T2 by one multiply with
exp(-λ(T2-T1))), so it slots into the same partials-roll-up pattern
as operators/rollup.py without ever revisiting raw rows.

Plan shape: per-row weight is a codegen'd exp() on integer
microsecond deltas, then ONE map-side-combining hash aggregate.
Time math follows the repo's events convention: TIMESTAMP_NTZ cast
to epoch micros via unix_micros(cast) — lossless under the UTC
session tz, replayable in DuckDB with EPOCH_US (q85).

Determinism: the decayed sums are float shuffle-sums, so publication
rounds at 9 (repo rule) — ranking or thresholding downstream must
use the rounded value.
"""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000


def decayed_agg(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    ref_ts: str,
    half_life_days: float,
    value: Column | None = None,
) -> DataFrame:
    """Per-group decayed aggregates anchored at ``ref_ts`` (an ISO
    timestamp string, the snapshot time): ``(group_cols..., n,
    decayed_count, decayed_sum?)`` — decayed columns rounded at 9,
    ``decayed_sum`` only when ``value`` is given. Rows with NULL
    timestamps are excluded (no defensible weight exists for them);
    rows AFTER ``ref_ts`` get weight > 1 by the same formula (the
    caller picks a ref covering the data, but a late-arriving row is
    not silently clamped)."""
    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be > 0, got {half_life_days}")
    # exp(-ln2 * age_days / half_life): ln2/half_life in per-day units,
    # age in exact integer microseconds scaled once.
    age_us = F.unix_micros(F.lit(ref_ts).cast("timestamp")) - F.unix_micros(
        F.col(ts_col).cast("timestamp")
    )
    lam = 0.6931471805599453 / (half_life_days * _US_PER_DAY)
    wgt = F.exp(-F.lit(lam) * age_us.cast("double"))
    base = df.filter(F.col(ts_col).isNotNull())
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(wgt), 9).alias("decayed_count"),
    ]
    if value is not None:
        aggs.append(F.round(F.sum(value.cast("double") * wgt), 9).alias("decayed_sum"))
    return base.groupBy(*group_cols).agg(*aggs)


def reanchor(
    partials: DataFrame,
    from_ref: str,
    to_ref: str,
    half_life_days: float,
    decayed_cols: list[str],
) -> DataFrame:
    """Re-anchor decayed partials from ``from_ref`` to ``to_ref`` by
    the single multiply exp(-λΔ) — how yesterday's rollup merges into
    today's without rescanning raw rows. Rounds at 9 on publication
    (one extra rounding vs a from-scratch pass: merging workflows
    must compare at ~1e-8, the documented cost of incrementality)."""
    d_us = int(
        (
            datetime.fromisoformat(to_ref) - datetime.fromisoformat(from_ref)
        ).total_seconds()
        * 1_000_000
    )
    lam = 0.6931471805599453 / (half_life_days * _US_PER_DAY)
    factor = math.exp(-lam * d_us)
    out = partials
    for c in decayed_cols:
        out = out.withColumn(c, F.round(F.col(c) * F.lit(factor), 9))
    return out
