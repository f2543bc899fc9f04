"""Streaming continuous aggregate: drained drops == batch recompute,
incremental across multiple drains, idempotent under re-drain, and
the txn variant commits atomically."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from knowledge_harvest_from_lms_spark.operators.rollup import (
    bucket_aggregate,
)
from knowledge_harvest_from_lms_spark.streaming.rollup_stream import (
    start_continuous_aggregate,
)

DAY = 86400

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _rows(df):
    return sorted(
        map(tuple, df.withColumn("sum_v", F.round("sum_v", 6)).collect())
    )


def _drain(spark, drop, out, ckpt, txn=False):
    q = start_continuous_aggregate(
        spark, drop, SCHEMA, out, ckpt,
        keys=["event_type"], value_col="value", width_s=DAY, txn=txn,
    )
    q.awaitTermination(300)


def _read(spark, out, txn):
    if txn:
        from knowledge_harvest_from_lms_spark.txn import TxnLog

        return TxnLog(spark, out).read("rollup")
    return spark.read.parquet(out)


@pytest.mark.parametrize("txn", [False, True])
def test_incremental_equals_batch(spark, tmp_path, txn):
    ev = _events(spark)
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")

    ev.filter(F.dayofmonth("ts") <= 10).write.mode("append").parquet(drop)
    _drain(spark, drop, out, ckpt, txn)
    mid = _read(spark, out, txn)
    exp_mid = bucket_aggregate(
        ev.filter(F.dayofmonth("ts") <= 10), ["event_type"], "value",
        width_s=DAY,
    )
    assert _rows(mid) == _rows(exp_mid)

    # second drop folds in WITHOUT re-reading the first
    ev.filter(F.dayofmonth("ts") > 10).write.mode("append").parquet(drop)
    _drain(spark, drop, out, ckpt, txn)
    final = _read(spark, out, txn)
    expected = bucket_aggregate(ev, ["event_type"], "value", width_s=DAY)
    assert _rows(final) == _rows(expected)

    # idempotence: a no-new-data drain changes nothing
    _drain(spark, drop, out, ckpt, txn)
    assert _rows(_read(spark, out, txn)) == _rows(expected)


def test_txn_replay_guard_no_double_count(spark, tmp_path):
    """A batch replayed against an already-committed cursor (crash in
    the sink-committed / checkpoint-uncommitted window, simulated by
    wiping the checkpoint) is SKIPPED — the additive fold must not
    double-count."""
    import shutil

    ev = _events(spark)
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")
    ev.write.mode("append").parquet(drop)
    _drain(spark, drop, out, ckpt, txn=True)
    expected = bucket_aggregate(ev, ["event_type"], "value", width_s=DAY)
    assert _rows(_read(spark, out, True)) == _rows(expected)

    shutil.rmtree(ckpt)  # forces a full replay as batch 0 again
    _drain(spark, drop, out, str(tmp_path / "ckpt2"), txn=True)
    assert _rows(_read(spark, out, True)) == _rows(expected)


def test_txn_replay_guard_survives_maintenance_vacuum(spark, tmp_path):
    """r4 ADVICE regression: maintenance commits used to carry no
    batch_id, so `compact` + `vacuum(retain=1)` aged out every fold
    manifest and a replayed batch re-folded (double-counting the
    additive partials). The sticky cursor in TxnLog.commit makes the
    compaction manifest inherit the fold's batch_id, so the guard
    still sees the cursor after the vacuum."""
    import shutil

    from knowledge_harvest_from_lms_spark.txn import TxnLog

    ev = _events(spark)
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "agg")
    ev.write.mode("append").parquet(drop)
    _drain(spark, drop, out, str(tmp_path / "ckpt"), txn=True)
    expected = bucket_aggregate(ev, ["event_type"], "value", width_s=DAY)

    log = TxnLog(spark, out)
    log.compact("rollup")  # maintenance commit after the last fold
    log.vacuum(retain=1)   # ages out the fold manifest itself
    v, manifest = log.latest()
    assert manifest["meta"].get("batch_id") is not None  # sticky cursor

    shutil.rmtree(str(tmp_path / "ckpt"))
    _drain(spark, drop, out, str(tmp_path / "ckpt2"), txn=True)
    assert _rows(_read(spark, out, True)) == _rows(expected)


def test_txn_history_one_commit_per_batch(spark, tmp_path):
    from knowledge_harvest_from_lms_spark.txn import TxnLog

    ev = _events(spark)
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "agg")
    ev.limit(100).write.mode("append").parquet(drop)
    _drain(spark, drop, out, str(tmp_path / "ckpt"), txn=True)
    log = TxnLog(spark, out)
    v, manifest = log.latest()
    assert v >= 0 and "batch_id" in manifest.get("meta", {})
