"""Streaming continuous aggregates: a hypertable rollup maintained by
Structured Streaming over an event drop directory.

Each micro-batch is bucket-aggregated into partial states and FOLDED
into the materialized table via `operators/rollup.merge_partials` —
the append-only monoid merge, O(batch + touched buckets) per batch,
never a base-table re-scan (TimescaleDB's continuous-aggregate
refresh policy, expressed as foreachBatch). Exactly-once comes from
the checkpointed source offsets + the staged overwrite (or, with
``txn=True``, an atomic :class:`~..txn.TxnLog` commit — same
trade-off as `streaming/incremental.start_incremental_grounding`,
whose upsert pattern this mirrors).

A replayed batch after a crash-before-commit re-merges into the
PREVIOUS snapshot (the overwrite never landed), so absolute partial
states stay correct — the idempotence test drains the same drop dir
twice and asserts the aggregate equals the batch recompute.
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
    or roll coarser with `rollup_partials`."""
    stream = spark.readStream.schema(schema).parquet(drop_dir)

    def fold(batch_df: DataFrame, _bid: int) -> None:
        sess = batch_df.sparkSession
        delta = bucket_aggregate(batch_df, keys, value_col, ts_col, width_s)
        if txn:
            from ..txn import TxnLog

            log = TxnLog(sess, agg_path)
            existing = log.read("rollup") if log.has_table("rollup") else None
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
