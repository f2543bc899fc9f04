"""Distributed prefix sum + concat-and-chunk sequence packing
(operators/packing.py): values pinned to a driver-side loop, bucket-
count invariance, and the plan contract that makes it scale — no
global empty-PARTITION-BY window anywhere."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.packing import (
    global_offsets,
    pack_sequences,
)


def _rows(n=400):
    # mixed sizes incl. zeros and one giant doc spanning many chunks
    out = [(i, (i * 37) % 23) for i in range(n)]
    out[50] = (50, 0)
    out[200] = (200, 1000)
    return out


def _expected_offsets(rows):
    exp, off = {}, 0
    for i, n in sorted(rows):
        exp[i] = off
        off += n
    return exp


@pytest.mark.parametrize("nb", [1, 8, 64])
def test_offsets_match_serial_scan_any_bucket_count(spark, nb):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: r["global_offset"]
        for r in global_offsets(df, "doc_id", "n", num_buckets=nb).collect()
    }
    assert got == _expected_offsets(rows)


def test_offsets_skewed_keys_and_negative_ids(spark):
    # key space wildly non-uniform: quantile bucketing must still
    # produce the exact serial-scan offsets
    rows = [(k, 3) for k in [-(10**9), -5, 0, 1, 2, 3, 10**12, 10**12 + 1]]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: r["global_offset"]
        for r in global_offsets(df, "doc_id", "n", num_buckets=4).collect()
    }
    assert got == _expected_offsets(rows)


def test_pack_spans_exact_and_chunks_full(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = sorted(
        (
            r["doc_id"],
            r["n_tokens"],
            r["global_offset"],
            r["chunk_id"],
            r["chunk_pos"],
            r["doc_pos"],
            r["span_len"],
        )
        for r in pack_sequences(df, "doc_id", "n", 64, num_buckets=8).collect()
    )
    exp, off = [], 0
    for i, n in sorted(rows):
        if n == 0:
            continue
        for c in range(off // 64, (off + n - 1) // 64 + 1):
            s, e = max(off, c * 64), min(off + n, (c + 1) * 64)
            exp.append((i, n, off, c, s - c * 64, s - off, e - s))
        off += n
    # zero-token docs are documented-dropped; total offset still
    # advances past them by 0 so neighbors are unaffected
    assert got == sorted(exp)
    per = {}
    for t in got:
        per[t[3]] = per.get(t[3], 0) + t[6]
    mx = max(per)
    assert all(v == 64 for c, v in per.items() if c < mx)
    assert 0 < per[mx] <= 64


def test_pack_validates_args(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n long")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "doc_id", "n", 0)
    with pytest.raises(ValueError, match="must differ"):
        global_offsets(df, "doc_id", "doc_id")


def test_no_global_window_in_plan(spark):
    """The scale contract: every Window node in the physical plan is
    partitioned (by the scan bucket) — a missing PARTITION BY would
    mean the whole corpus sorts in ONE task."""
    df = spark.createDataFrame(_rows(), "doc_id long, n long")
    out = pack_sequences(df, "doc_id", "n", 64, num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__psum_bucket" in line, line
