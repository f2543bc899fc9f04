"""Streaming continuous aggregates: a hypertable rollup maintained by
Structured Streaming over an event drop directory.

Each micro-batch is bucket-aggregated into partial states and FOLDED
into the materialized table via `operators/rollup.merge_partials` —
the append-only monoid merge, O(batch + touched buckets) per batch,
never a base-table re-scan (TimescaleDB's continuous-aggregate
refresh policy, expressed as foreachBatch).

Exactly-once: the fold is ADDITIVE, so unlike the absolute-counts
upsert in `streaming/incremental.start_incremental_grounding` it is
NOT naturally idempotent — a batch replayed after a crash between
the sink write and the streaming checkpoint commit must be detected,
not re-applied. ``txn=True`` closes this completely: the batch id
rides the TxnLog manifest, and the fold SKIPS any batch id at or
below the last committed one (manifest + data are one atomic
commit, so cursor and table can never disagree). The plain-layout
path has the standard foreachBatch caveat instead: a crash in the
sink-committed/checkpoint-uncommitted window (or mid-promote inside
stage_overwrite) can double-apply or tear the snapshot on replay —
use ``txn=True`` where that window matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..fsutil import hadoop_exists, stage_overwrite
from ..operators.rollup import bucket_aggregate, merge_partials


def start_continuous_aggregate(
    spark: SparkSession,
    drop_dir: str,
    schema,
    agg_path: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    ts_col: str = "ts",
    width_s: int = 3600,
    txn: bool = False,
):
    """Start (availableNow) the rollup-maintenance stream over parquet
    drops in ``drop_dir``; returns the StreamingQuery. The
    materialized table at ``agg_path`` holds (keys..., bucket, n,
    sum_v, min_v, max_v) — finalize with `operators/rollup.read_stats`
    or roll coarser with `rollup_partials`. ``checkpoint_dir`` and
    ``agg_path`` are paired for life (standard foreachBatch rule):
    a fresh checkpoint re-emits everything as batch 0, which the txn
    replay guard will treat as already folded."""
    stream = spark.readStream.schema(schema).parquet(drop_dir)

    def fold(batch_df: DataFrame, _bid: int) -> None:
        sess = batch_df.sparkSession
        delta = bucket_aggregate(batch_df, keys, value_col, ts_col, width_s)
        if txn:
            from ..txn import TxnLog

            log = TxnLog(sess, agg_path)
            if log.has_table("rollup"):
                # replay guard: batches arrive in order, so a batch id
                # at/below the committed cursor was already folded in
                # (crash landed between our commit and the streaming
                # checkpoint's) — re-applying would double-count.
                # TxnLog.commit makes batch_id sticky (maintenance
                # commits inherit it), so the latest manifest always
                # carries the cursor even after vacuum(retain=1); the
                # walk-back below remains for pre-sticky logs.
                v, manifest = log.latest()
                last = manifest.get("meta", {}).get("batch_id")
                while last is None and v > 0:
                    v -= 1
                    m = log.commit_meta(v)
                    last = (m or {}).get("batch_id")
                if last is not None and int(_bid) <= int(last):
                    return
                existing = log.read("rollup")
            else:
                existing = None
            log.commit(
                overwrites={"rollup": merge_partials(existing, delta, keys)},
                meta={"batch_id": int(_bid)},
            )
            return
        existing = (
            sess.read.parquet(agg_path)
            if hadoop_exists(sess, agg_path)
            else None
        )
        stage_overwrite(merge_partials(existing, delta, keys), agg_path)

    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
