#!/usr/bin/env python
"""Continuous-aggregate maintenance entry point — event drops folded
into a materialized hypertable rollup (streaming/rollup_stream.py):

  spark-submit --py-files kg_spark.zip jobs/run_rollup.py \\
      --drops s3://bucket/event_drops --agg s3://bucket/wh/rollup \\
      --checkpoints s3://bucket/ckpt/rollup \\
      --keys event_type --value value --width 3600 --txn

Each invocation drains whatever event files landed since the last run
(availableNow trigger — cron'd batch or long-running stream); each
micro-batch costs O(batch + touched buckets), never a base re-scan.
--txn makes the fold a TxnLog commit with a batch-id replay cursor
(exactly-once even if a crash lands between the sink commit and the
streaming checkpoint); the plain layout has the standard foreachBatch
replay caveat.

Sandbox smoke run:

  python jobs/run_rollup.py --synth-drop 1000 \\
      --drops /tmp/kg_event_drops --agg /tmp/kg_warehouse/rollup \\
      --checkpoints /tmp/kg_checkpoints/rollup --txn
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--drops", required=True, help="event-drop parquet dir (streamed)")
    p.add_argument("--agg", required=True, help="materialized rollup table path")
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--keys", default="event_type",
                   help="comma-separated grouping columns")
    p.add_argument("--value", default="value", help="measure column")
    p.add_argument("--ts", default="ts", help="event-time column")
    p.add_argument("--width", type=int, default=3600,
                   help="bucket width in seconds (finest grain)")
    p.add_argument("--txn", action="store_true",
                   help="fold via atomic TxnLog commits with the "
                        "batch-id replay cursor")
    p.add_argument("--synth-drop", type=int, default=0,
                   help="write N synthetic events into --drops first (sandbox)")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    args = p.parse_args()

    from pyspark.sql import functions as F

    from knowledge_harvest_from_lms_spark.session import get_session
    from knowledge_harvest_from_lms_spark.streaming.rollup_stream import (
        start_continuous_aggregate,
    )

    spark = get_session(cpus=args.cpus, shuffle_partitions=args.cpus,
                        app_name="kg-rollup")
    keys = [k for k in args.keys.split(",") if k]

    if args.synth_drop:
        # deterministic synthetic events in the testdata events shape
        (
            spark.range(args.synth_drop)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_micros(
                    F.lit(1704067200_000_000)
                    + F.pmod(F.xxhash64("id"), F.lit(30 * 86400 * 10**6))
                ).cast("timestamp_ntz").alias("ts"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(150)).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(t) for t in
                              ("view", "click", "purchase", "signup", "error")]),
                    (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5)) + 1).cast("int"),
                ).alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(40000)) / 100.0)
                .alias("value"),
                F.lit("{}").alias("props"),
            )
            .write.mode("append").parquet(args.drops)
        )

    schema = spark.read.parquet(args.drops).schema
    q = start_continuous_aggregate(
        spark, args.drops, schema, args.agg, args.checkpoints,
        keys=keys, value_col=args.value, ts_col=args.ts,
        width_s=args.width, txn=args.txn,
    )
    q.awaitTermination()

    if args.txn:
        from knowledge_harvest_from_lms_spark.txn import TxnLog

        rollup = TxnLog(spark, args.agg).read("rollup")
    else:
        rollup = spark.read.parquet(args.agg)
    n = rollup.count()
    groups = rollup.select(*keys).distinct().count()
    print(f"rollup={n} (key-grain groups: {groups}) buckets at {args.agg}")
    spark.stop()


if __name__ == "__main__":
    main()
