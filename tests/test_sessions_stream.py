"""Streaming sessionization (streaming/sessions_stream.py): the
session_window path drains a multi-drop event stream and must agree
row-for-row with the batch operator on off-boundary data, across
micro-batch splits (a session spanning two drops must still come out
as ONE row once closed)."""

from datetime import datetime

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.sessions import session_stats
from knowledge_harvest_from_lms_spark.streaming.sessions_stream import (
    session_stats_stream,
)

SCHEMA = "event_id long, user_id long, ts timestamp"


def _ts(s):
    return datetime.fromisoformat(s)


def _rows():
    return [
        # user 1: session A (3 events, crosses the drop boundary),
        # then a 2h break, then session B
        (1, 1, _ts("2024-01-01T00:00:00")),
        (2, 1, _ts("2024-01-01T00:20:00")),
        (3, 1, _ts("2024-01-01T00:40:00")),
        (4, 1, _ts("2024-01-01T02:40:01")),
        # user 2: one long-lived single session
        (5, 2, _ts("2024-01-01T01:00:00")),
        (6, 2, _ts("2024-01-01T01:30:00")),
        # NULL key excluded in both paths
        (7, None, _ts("2024-01-01T01:00:00")),
    ]


def test_streamed_sessions_equal_batch(spark, tmp_path):
    drop = str(tmp_path / "drops")
    out_rows = []

    batch_df = spark.createDataFrame(_rows(), SCHEMA)
    # gap 3600s: no inter-event gap in the fixture equals it exactly
    expected = {
        (r["user_id"], r["session_start"]): (
            r["n_events"],
            r["session_end"],
            r["duration_us"],
        )
        for r in session_stats(
            batch_df, "user_id", "ts", "event_id", 3600
        ).collect()
    }

    # split the stream so session A straddles drops 1 and 2
    spark.createDataFrame(_rows()[:2], SCHEMA).write.mode("overwrite").parquet(
        drop
    )
    spark.createDataFrame(_rows()[2:], SCHEMA).write.mode("append").parquet(
        drop
    )

    stream = spark.readStream.schema(SCHEMA).parquet(drop)
    agg = session_stats_stream(stream, "user_id", "ts", 3600.0)

    def sink(df, bid):
        out_rows.extend(df.collect())

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # append mode only emits sessions the watermark has CLOSED; the
    # last session per key can stay open at end-of-stream, so assert
    # everything emitted matches batch exactly and that the
    # cross-drop session A came out as one merged row
    got = {
        (r["user_id"], r["session_start"]): (
            r["n_events"],
            r["session_end"],
            r["duration_us"],
        )
        for r in out_rows
    }
    assert got, "watermark closed no sessions — fixture time range too tight"
    for k, v in got.items():
        assert expected[k] == v, (k, v, expected[k])
    a_key = (1, _ts("2024-01-01T00:00:00"))
    assert a_key in got and got[a_key][0] == 3  # merged across drops
