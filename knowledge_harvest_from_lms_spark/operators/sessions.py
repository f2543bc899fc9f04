"""Gap-based sessionization of an event stream, window-relational.

The standard clickstream/telemetry primitive (and the shape of the
reference pipeline's per-relation harvest "episodes" when replayed
from the streaming ledger): events of one key become sessions
whenever the gap to the previous event exceeds ``gap``. Classic
two-window formulation — no UDF, no state store:

1. ``lag(ts) OVER (PARTITION BY key ORDER BY ts, id)`` → a 0/1
   "session starts here" flag (first event or gap exceeded);
2. a running SUM of the flag over the same window → the per-key
   session ordinal; (key, ordinal) is the session id.

Scale: both windows partition by the event KEY — per-user event
counts are bounded in any real stream (a window over the bare date,
by contrast, would serialize a day of the planet's events into one
task). Hot keys (bots) are real: cap them upstream with q50's
deterministic sampler or split by coarse time range exactly like
``asof_join(split_ranges=...)`` — a session never spans a gap, so
ranges split at any gap boundary are lossless; we keep the plan
simple because per-key volume is the designed-in bound. Aggregation
to one row per session is a plain groupBy on (key, ordinal), which
map-side combines.

Determinism: all time math is integer MICROSECONDS
(``unix_micros``), never float seconds, so a gap comparison can't
round differently across engines (the q71 oracle replays with
DuckDB's ``EPOCH_US``); the window orders by (ts, id) — a ts tie
would otherwise let two shuffles disagree on lag() and move a
session boundary (the repo-wide tie-break rule; id must be unique
per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(ts_col: str):
    """unix_micros with a TIMESTAMP cast first: parquet event times
    are often TIMESTAMP_NTZ, which unix_micros rejects; the session
    timezone is pinned to UTC (session.py) so the cast is exact."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Append ``session_ord`` (1-based per-key session ordinal): a
    new session starts at the first event of a key and whenever
    ``ts - previous ts > gap_seconds``. NULL keys/timestamps are
    excluded (a session of unknown owner or time is meaningless)."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    us = _micros(ts_col)
    prev = F.lag(us).over(w)
    new_flag = F.when(prev.isNull() | (us - prev > F.lit(gap_us)), 1).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("__new", new_flag)
        .withColumn("session_ord", F.sum("__new").over(run))
        .drop("__new")
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int,
) -> DataFrame:
    """One row per session: ``(key, session_ord, n_events,
    session_start, session_end, duration_us)`` — the groupBy is on
    (key, ordinal), so hot sessions map-side combine; the duration is
    exact integer micros."""
    s = sessionize(df, key_col, ts_col, id_col, gap_seconds)
    us = _micros(ts_col)
    return s.groupBy(F.col(key_col), F.col("session_ord")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )
