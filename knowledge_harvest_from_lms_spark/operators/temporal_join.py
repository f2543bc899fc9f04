"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval-containment) join, expressed as shuffle-bounded DataFrame
plans instead of the BroadcastNestedLoopJoin Catalyst falls back to
for non-equi conditions.

As-of join (`asof_join`) — for every left row (key, ts) attach the
latest right row with the same key and right_ts <= ts ("backward";
"forward" mirrors it). The classic trades/quotes primitive
(pandas.merge_asof, kdb+ aj, DuckDB ASOF JOIN). Plan shape: tag the
two inputs, UNION them, and run ONE window per key ordered by
(ts, side) carrying `last(right_payload, ignorenulls=True)` — i.e.
exactly the interleaved merge a range-partitioned merge-join would
do, as a single shuffle on the key plus an in-partition sort. No row
amplification, no inequality join. A naive `l JOIN r ON l.k = r.k
AND r.ts <= l.ts` explodes to |pairs| rows and re-collapses with an
argmax — quadratic in events-per-key; this stays linear.

Range join (`range_join`) — match point rows to interval rows
(start <= ts <= end) per key. Plan shape: quantize time onto a grid,
explode each interval into the grid cells it intersects, equi-join
on (key, cell) with the exact containment predicate INSIDE the join
condition (cheap-first), no post-dedup needed: a point lives in
exactly one cell, so each qualifying (point, interval) pair meets
exactly once. Grid cell size trades explode factor against join
selectivity; `max_span_cells` hard-bounds the amplification so a
degenerate interval cannot quadratic the job.

Scale notes (SCALE.md rows "asof join" / "range join"): both plans
shuffle once on the join key (+cell); per-key skew lands in one
sort partition for as-of — at web scale choose a key with bounded
per-key event counts (user, instrument) or pass `split_ranges=N`,
which pre-splits each key's timeline into N coarse time ranges
(approx-quantile boundaries over the left ts), runs the merge window
per (key, range), and restores cross-range correctness with a
boundary carry-in: a tiny per-(key, range) aggregate of each range's
best right row, cascaded by a window over the N-row-per-key
aggregate and broadcast-joined back. Result is bit-identical to the
unsplit plan (pinned in tests) while a hot key's sort partition
shrinks by ~N×.

NULL join keys never match (SQL equi-join semantics; pandas
merge_asof rejects them): right rows with a NULL key are dropped,
left rows with a NULL key are kept with NULL payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _collapse_right(
    right: DataFrame, on: list[str], right_ts: str, payload: list[str]
) -> DataFrame:
    """One right row per (key, ts): deterministic max-struct collapse
    (as-of semantics are defined on the latest right observation at a
    timestamp; pandas.merge_asof's 'last occurrence in input order'
    is partition-order-dependent, so it is replaced by an order-free
    rule both engines can replay)."""
    agg = F.max(F.struct(*[F.col(c) for c in payload])).alias("_p")
    out = right.groupBy(*on, right_ts).agg(agg)
    return out.select(
        *on, right_ts, *[F.col(f"_p.{c}").alias(c) for c in payload]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
    split_ranges: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the
    latest right row with right_ts <= left_ts (direction="backward")
    or the earliest with right_ts >= left_ts ("forward") for the same
    key. Right payload columns come back suffixed on name collision;
    the matched timestamp is `f"{right_ts}{suffix}"`. Rows with no
    match (or outside `tolerance_s` seconds) keep NULL payloads —
    the join is row-preserving on the left. NULL join keys never
    match (matching SQL equi-joins and pandas.merge_asof, which
    rejects them): NULL-key left rows survive with NULL payloads.

    `split_ranges=N` (N >= 2) is the hot-key guard: the per-key sort
    partition is split into N coarse time ranges with a boundary
    carry-in, producing the identical result with ~N× less data per
    window partition (see module docstring)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in on and c != right_ts]
    if not payload:
        raise ValueError("right side has no payload columns besides key/ts")
    # NULL keys must not match: Window.partitionBy groups NULLs into
    # one partition, so NULL-key right rows would otherwise leak their
    # payloads into NULL-key left rows.
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    right = _collapse_right(right, on, right_ts, payload)

    ts_out = f"{right_ts}{suffix}"
    out_names = [ts_out] + [
        c + (suffix if c in left.columns else "") for c in payload
    ]
    rstruct = F.struct(
        F.col(right_ts).alias(ts_out),
        *[F.col(c) for c in payload],
    )
    # side tag orders a right row BEFORE a left row at the same ts:
    # right_ts == left_ts counts as available in both directions.
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rstruct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    asc = direction == "backward"
    order = [F.col("_ts").asc() if asc else F.col("_ts").desc(),
             F.col("_side").asc()]
    uni = r_tagged.unionByName(l_tagged)
    if split_ranges is not None and split_ranges >= 2:
        # Hot-key guard: bucket each key's timeline into coarse time
        # ranges so a skewed key's window partition shrinks ~N×. The
        # approx-quantile probe is a bounded driver action (N-1
        # doubles); boundary values only steer partitioning, never
        # the result, so the approximation is benign.
        probs = [i / split_ranges for i in range(1, split_ranges)]
        # timestamp/date ts columns can't cast straight to double —
        # route them through unix_micros (the shift a session-tz cast
        # introduces is applied identically to bounds and rows, so
        # range assignment is unaffected)
        if left.schema[left_ts].dataType.simpleString().startswith(
            ("timestamp", "date")
        ):
            as_d = lambda c: (  # noqa: E731
                F.unix_micros(c.cast("timestamp")).cast("double")
            )
        else:
            as_d = lambda c: c.cast("double")  # noqa: E731
        bounds = sorted(set(
            left.select(as_d(F.col(left_ts)).alias("_t"))
            .na.drop().approxQuantile("_t", probs, 0.001)
        ))
        rng_expr = F.lit(0)
        for b in bounds:
            rng_expr = rng_expr + F.when(
                as_d(F.col("_ts")) >= F.lit(float(b)), 1
            ).otherwise(0)
        uni = uni.withColumn("_rng", rng_expr)
        # Boundary carry-in: per (key, range) best right row (max
        # struct for backward = latest; min for forward = earliest),
        # cascaded across ranges by a window over the tiny aggregate.
        # Ranges are time-ordered, so the previous range PRESENT with
        # a right row holds the globally best preceding right row.
        side_best = (F.max if asc else F.min)(
            F.when(F.col("_side") == 0, F.struct(F.col("_ts"), F.col("_r")))
        ).alias("_b")
        cw = (
            W.partitionBy(*on)
            .orderBy(F.col("_rng").asc() if asc else F.col("_rng").desc())
            .rowsBetween(W.unboundedPreceding, -1)
        )
        carry = (
            uni.groupBy(*on, "_rng").agg(side_best)
            .withColumn("_cin", F.last("_b", ignorenulls=True).over(cw)["_r"])
            .select(*on, "_rng", "_cin")
        )
        w = (
            W.partitionBy(*on, "_rng")
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = (
            uni.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
            .join(carry, on + ["_rng"], "left")
            .withColumn("_m", F.coalesce(F.col("_m"), F.col("_cin")))
            .filter(F.col("_side") == 1)
        )
    else:
        w = (
            W.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = (
            uni
            .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
            .filter(F.col("_side") == 1)
        )
    if tolerance_s is not None:
        # cast covers TIMESTAMP_NTZ inputs; only the difference is
        # used, so the session-tz shift cancels
        gap = F.abs(
            F.unix_micros(F.col("_ts").cast("timestamp"))
            - F.unix_micros(F.col(f"_m.{ts_out}").cast("timestamp"))
        ) / F.lit(1_000_000.0)
        carried = carried.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_s)), F.col("_m"))
        )
    return carried.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{f}").alias(o)
          for f, o in zip([ts_out] + payload, out_names)],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str] | None,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    grid_s: int = 3600,
    max_span_cells: int = 10_000,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them
    (start <= ts <= end, same key). Output = point columns + interval
    columns. `grid_s` is the quantization cell in seconds; intervals
    longer than `max_span_cells` cells raise rather than explode."""
    on = [] if on is None else [on] if isinstance(on, str) else list(on)
    if grid_s <= 0:
        raise ValueError(f"grid_s must be positive, got {grid_s}")
    dup = set(points.columns) & set(intervals.columns) - set(on)
    if dup:
        raise ValueError(f"rename colliding columns first: {sorted(dup)}")

    cell = lambda c: F.floor(
        F.unix_micros(c.cast("timestamp")) / F.lit(grid_s * 1_000_000)
    )
    n_cells = cell(F.col(end_col)) - cell(F.col(start_col)) + 1
    guarded = F.when(
        n_cells <= F.lit(max_span_cells), n_cells
    ).otherwise(
        F.raise_error(F.format_string(
            "range_join: interval spans %d cells > max_span_cells=%d "
            "(widen grid_s or split the interval)",
            n_cells, F.lit(max_span_cells),
        ))
    )
    iv = intervals.withColumn(
        "_cell",
        F.explode(F.sequence(
            cell(F.col(start_col)),
            cell(F.col(start_col)) + guarded - 1,
        )),
    )
    # explicit aliases: points and intervals often share lineage
    # (both sliced from one events scan) and bare df[col] references
    # would hit the ambiguous-self-join trap
    pt = points.withColumn("_cell", cell(F.col(point_ts))).alias("_pt")
    iv = iv.alias("_iv")
    p, i = (lambda c: F.col(f"_pt.{c}")), (lambda c: F.col(f"_iv.{c}"))
    cond = p("_cell") == i("_cell")
    for k in on:
        cond &= p(k) == i(k)
    # containment predicate IN the join condition (cheap-first):
    cond &= p(point_ts) >= i(start_col)
    cond &= p(point_ts) <= i(end_col)
    return pt.join(iv, cond, "inner").select(
        *[p(c) for c in points.columns],
        *[i(c) for c in intervals.columns if c not in on],
    )
