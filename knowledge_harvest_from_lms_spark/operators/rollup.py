"""Hypertable-style continuous aggregates: multi-grain time rollups
with partial re-aggregation and affected-bucket incremental refresh
(the TimescaleDB continuous-aggregate / materialized-rollup shape).

The two moves that matter at 100 TB of events:

1. **Coarser grains re-aggregate PARTIALS, never raw rows.** The
   hourly table stores decomposable partial states (count, sum, min,
   max — avg is derived as sum/count at read time, exactly like
   Spark's own partial aggregation protocol). Daily then reads
   |hourly| rows, monthly reads |daily| — each level is ~2-3 orders
   of magnitude smaller than the base table, so the whole hierarchy
   costs barely more than the finest grain.

2. **Refresh recomputes only AFFECTED buckets.** A late-arriving /
   corrected delta batch touches a handful of (keys, bucket) groups;
   `refresh_affected` recomputes those groups from the base table
   (one partition-prunable scan — bucket predicates align with a
   `days(ts)`-partitioned layout) and splices them into the
   materialized table with an anti-join. Everything untouched is
   never read, matching the incremental discipline of
   `streaming/incremental.py`.

Bucket arithmetic is integer epoch-seconds division (UTC session tz)
— replayable in any engine; q63 verifies the hourly→daily partial
re-aggregation against a direct raw-rows GROUP BY in DuckDB, pinning
losslessness of the hierarchy.

`sum_v` is DECIMAL(38,9), not double: each value is quantized once at
1e-9 (the generalized q01 integer-cents trick — decimal IS a scaled
int128) and every subsequent addition is exact integer arithmetic, so
grain re-aggregation and streaming merges are ORDER-EXACT — the same
bits no matter how partitions, grains, or micro-batches interleave
the additions. A double `sum_v` drifts: 10¹² rows re-added in a
different order at each grain shifts the low bits, so hourly→daily
could disagree with a direct aggregate (SCALE.md's q63 gap note,
closed here). Headroom: values up to ~1e12 with 9 decimals are 21 of
38 digits; 10¹² such rows sum to 33 digits — no overflow at target
scale. min/max stay double (order-free by definition); avg is derived
at read time as one exact-sum / count division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decomposable partial states; avg/rate are DERIVED at read time
_PARTIALS = ("n", "sum_v", "min_v", "max_v")

# exact order-free sums: quantize once at 1e-9, add as int128
_SUM_DT = "decimal(38,9)"


def time_bucket(ts: Column, width_s: int) -> Column:
    """Bucket start (timestamp, same wall-clock family as the input)
    — floor(epoch / width) * width, the time_bucket(width, ts) of
    TimescaleDB. Integer arithmetic: engine-replayable."""
    if width_s <= 0:
        raise ValueError(f"width_s must be positive, got {width_s}")
    t = ts.cast("timestamp")
    start = (
        F.floor(F.unix_micros(t) / F.lit(width_s * 1_000_000))
        * F.lit(width_s * 1_000_000)
    ).cast("long")
    # always NTZ: bucket columns from any input flavor stay
    # join-compatible across grains (session tz is UTC)
    return F.timestamp_micros(start).cast("timestamp_ntz")


def bucket_aggregate(
    events: DataFrame,
    keys: list[str],
    value_col: str,
    ts_col: str = "ts",
    width_s: int = 3600,
) -> DataFrame:
    """Finest-grain partial table: (keys..., bucket, n, sum_v, min_v,
    max_v). ONE map-side-combining aggregate over the base table —
    the only place raw rows are ever read."""
    return (
        events.withColumn("bucket", time_bucket(F.col(ts_col), width_s))
        .groupBy(*keys, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # quantize ONCE here; all later re-aggregation is exact
            F.sum(F.col(value_col).cast("double").cast(_SUM_DT))
            .cast(_SUM_DT).alias("sum_v"),
            F.min(F.col(value_col).cast("double")).alias("min_v"),
            F.max(F.col(value_col).cast("double")).alias("max_v"),
        )
    )


def rollup_partials(
    finer: DataFrame,
    keys: list[str],
    width_s: int,
    finer_width_s: int | None = None,
) -> DataFrame:
    """Re-bucket a finer partial table to a coarser grain WITHOUT
    touching raw rows: counts/sums add, mins/maxes fold. `width_s`
    must be a multiple of the finer grain for exact containment —
    otherwise a finer bucket straddles two coarse buckets and its
    whole partial is silently assigned to the one containing its
    START. Pass ``finer_width_s`` to enforce the multiple; it is
    optional only for callers whose grain isn't statically known."""
    if finer_width_s is not None:
        if finer_width_s <= 0:
            raise ValueError(f"finer_width_s must be positive, got {finer_width_s}")
        if width_s % finer_width_s != 0:
            raise ValueError(
                f"width_s={width_s} is not a multiple of "
                f"finer_width_s={finer_width_s}: finer buckets would "
                "straddle coarse boundaries and misassign partials"
            )
    return (
        finer.withColumn("bucket", time_bucket(F.col("bucket"), width_s))
        .groupBy(*keys, "bucket")
        .agg(
            F.sum("n").alias("n"),
            # cast pins the schema to decimal(38,9) at every grain
            F.sum("sum_v").cast(_SUM_DT).alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def read_stats(partials: DataFrame) -> DataFrame:
    """Materialize the derived measures (avg) on top of the partial
    states — the 'finalize' step, applied at ANY grain."""
    return partials.withColumn(
        "avg_v", F.round(F.col("sum_v").cast("double") / F.col("n"), 9)
    )


def merge_partials(
    existing: DataFrame | None, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a delta's partial states into the materialized table —
    the APPEND-ONLY maintenance path: counts/sums add, mins/maxes
    fold, so a new batch of events merges in O(|touched buckets|)
    without re-reading the base table at all (`refresh_affected` is
    for corrections, where existing rows CHANGED). The partial states
    form commutative monoids; with the decimal sum they are EXACT
    monoids — merge order never matters at all, not even in the last
    ulp, so any interleaving of micro-batches yields the same bits."""
    if existing is None:
        return delta
    return (
        existing.unionByName(delta)
        .groupBy(*keys, "bucket")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").cast(_SUM_DT).alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def refresh_affected(
    base: DataFrame,
    materialized: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    ts_col: str = "ts",
    width_s: int = 3600,
) -> DataFrame:
    """Incremental continuous-aggregate refresh: recompute ONLY the
    (keys, bucket) groups the delta touches, keep every other
    materialized row as-is. `base` must already contain the delta's
    rows (refresh runs after the append). Bucket membership is a
    broadcast-friendly distinct set — |touched buckets|, not |rows|."""
    touched = (
        delta.withColumn("bucket", time_bucket(F.col(ts_col), width_s))
        .select(*keys, "bucket")
        .distinct()
    )
    recomputed = bucket_aggregate(
        base.join(
            F.broadcast(touched.select("bucket").distinct()),
            time_bucket(F.col(ts_col), width_s) == F.col("bucket"),
            "left_semi",
        ),
        keys, value_col, ts_col, width_s,
    ).join(F.broadcast(touched), [*keys, "bucket"], "left_semi")
    kept = materialized.join(
        F.broadcast(touched), [*keys, "bucket"], "left_anti"
    )
    return kept.unionByName(recomputed)
