"""Sessionization (operators/sessions.py) and inverted-index
materialization (operators/inverted_index.py): values pinned to
driver-side references, determinism under ties, bounded-group
contracts."""

import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.inverted_index import (
    inverted_postings,
    posting_shards,
)
from knowledge_harvest_from_lms_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark):
    rows = [
        # user 1: two sessions (gap 3600s, break at >1h)
        (1, 1, _ts("2024-01-01T00:00:00")),
        (2, 1, _ts("2024-01-01T00:30:00")),
        (3, 1, _ts("2024-01-01T02:00:01")),  # 5401s after -> new
        # user 2: single event
        (4, 2, _ts("2024-01-01T00:00:00")),
        # ts tie inside user 3: order falls back to event_id
        (6, 3, _ts("2024-01-01T05:00:00")),
        (5, 3, _ts("2024-01-01T05:00:00")),
        # boundary: gap EXACTLY 3600s stays in-session (strict >)
        (7, 4, _ts("2024-01-01T00:00:00")),
        (8, 4, _ts("2024-01-01T01:00:00")),
        # excluded rows
        (9, None, _ts("2024-01-01T00:00:00")),
        (10, 5, None),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )


def test_sessionize_ordinals_and_null_exclusion(spark):
    out = sessionize(_events(spark), "user_id", "ts", "event_id", 3600)
    got = {r["event_id"]: r["session_ord"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1, 6: 1, 7: 1, 8: 1}


def test_session_stats_exact_micros(spark):
    out = session_stats(_events(spark), "user_id", "ts", "event_id", 3600)
    rows = {(r["user_id"], r["session_ord"]): r for r in out.collect()}
    assert rows[(1, 1)]["n_events"] == 2
    assert rows[(1, 1)]["duration_us"] == 1800 * 1_000_000
    assert rows[(1, 2)]["n_events"] == 1 and rows[(1, 2)]["duration_us"] == 0
    assert rows[(4, 1)]["duration_us"] == 3600 * 1_000_000
    assert (5, 1) not in rows  # NULL ts row excluded entirely
    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(_events(spark), "user_id", "ts", "event_id", 0)


def test_sessionize_windows_are_key_partitioned(spark):
    out = sessionize(_events(spark), "user_id", "ts", "event_id", 3600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line, line


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog. The DOG!"),
        (3, "cat and dog and cat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_postings(rows, min_df=1):
    per = {}
    for doc_id, text in rows:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        for pos, t in enumerate(toks):
            per.setdefault((t, doc_id), []).append(pos)
    df = {}
    for (t, _d) in per:
        df[t] = df.get(t, 0) + 1
    return {
        (t, d): (len(ps), ps, df[t])
        for (t, d), ps in per.items()
        if df[t] >= min_df
    }


def test_inverted_postings_exact(spark):
    rows = [(1, "the cat sat on the mat"), (2, "the dog. The DOG!"),
            (3, "cat and dog and cat")]
    got = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]), r["df"])
        for r in inverted_postings(_docs(spark)).collect()
    }
    assert got == _ref_postings(rows)
    # min_df drops hapax terms but keeps corpus-true df values
    got2 = inverted_postings(_docs(spark), min_df=2).collect()
    assert {r["term"] for r in got2} == {"the", "cat", "dog"}
    assert all(r["df"] >= 2 for r in got2)


def test_posting_shards_partition_exactly(spark):
    flat = inverted_postings(_docs(spark))
    sh = posting_shards(flat, n_shards=2).collect()
    # union of shards == the flat postings, disjoint by doc_id % 2
    rebuilt = {}
    for r in sh:
        assert all(p["doc_id"] % 2 == r["shard"] for p in r["postings"])
        for p in r["postings"]:
            rebuilt[(r["term"], p["doc_id"])] = (
                p["tf"], list(p["positions"]), r["df"]
            )
    flat_map = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]), r["df"])
        for r in flat.collect()
    }
    assert rebuilt == flat_map
    with pytest.raises(ValueError, match="n_shards"):
        posting_shards(flat, 0)
