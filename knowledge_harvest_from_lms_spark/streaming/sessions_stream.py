"""Streaming sessionization: the Structured-Streaming twin of
``operators/sessions.py`` built on Spark's native ``session_window``
(dynamic-gap session aggregation with watermark-driven state
eviction) — the idiomatic engine path for "sessions over an unbounded
stream", no custom state store needed.

Semantics note (documented, tested): ``session_window`` merges an
event into the open session while ``ts < previous_end`` where
``previous_end = prev_ts + gap`` — i.e. a gap EXACTLY equal to
``gap_seconds`` starts a new session. The batch operator's boundary
is ``gap > gap_seconds`` (strict), so batch == streamed everywhere
except events landing exactly on the boundary; the parity test uses
off-boundary data and the job contract says "choose a gap that is
not a legal inter-event quantum" (for integer-second event clocks,
any gap with sub-second fraction, e.g. 1800.5 s, makes the two
definitions identical).

Scale: state is per (key, open session) and the watermark closes
sessions whose end is older than the allowed lateness — state size
is bounded by active keys, not history (the standard session-window
deployment shape). Output mode must be "append"-compatible: a
session row emits only once its window can no longer grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-session stats ``(key, session_start, session_end,
    n_events, duration_us)`` over a streaming DataFrame. session_end
    is the LAST EVENT's ts (not the window's speculative ts+gap
    close), so rows are directly comparable with the batch
    ``session_stats``; duration is exact integer micros."""
    from ..operators.sessions import _micros

    us = _micros(ts_col)
    return (
        events.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (F.max(us) - F.min(us)).alias("duration_us"),
        )
        .drop("session_window")
    )
