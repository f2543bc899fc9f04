"""Z-order (Morton) multi-column clustering keys, computed as pure
JVM Column arithmetic.

Why: per-file min/max stats (``txn.TxnLog`` manifests, parquet
footers) prune a linearly-sorted layout well on the FIRST sort key
only — a predicate on the second column still touches every file.
Interleaving the bits of per-column bucket ids gives every statted
column locality at once: a rectangle query touches ~O(perimeter)
files instead of all of them (Delta OPTIMIZE ZORDER BY / Iceberg's
z-ordered rewrite strategy — re-derived here from the public Morton-
code construction, no engine code consulted).

Two bucketing modes:

- ``int_bucket``: exact integer arithmetic over a [mn, mx] range —
  deterministic and engine-portable (DuckDB replays it with the same
  ``//`` and bit ops), used by the q67 oracle query.
- ``quantile_bounds`` + ``bucket_from_bounds``: approxQuantile
  boundaries, skew-resistant (equal-POPULATION buckets, so one hot
  host / timestamp burst cannot collapse the z-curve onto a few
  codes) — the 100 TB path. Boundaries are a driver-side list of at
  most 2^bits floats; the per-row bucket is a fold over that literal
  array (whole-stage-codegen'd, no UDF).

At 100 TB this runs inside ``TxnLog.compact(zorder_by=...)``: ONE
extra narrow projection on the rewrite the compaction was doing
anyway; boundary estimation is one approxQuantile pass per column
(sampled by Spark internally). No shuffle is added — the z-value
simply replaces the range-partition key the sorted rewrite already
shuffles on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 columns x 15 bits = 60 interleaved bits — stays inside a signed
# 64-bit long with headroom, which both Spark and DuckDB shift on.
MAX_TOTAL_BITS = 60


def int_bucket(col: Column, mn: int, mx: int, bits: int) -> Column:
    """Bucket an INTEGER column into [0, 2^bits) with exact integer
    arithmetic: ``(x - mn) * 2^bits // (mx - mn + 1)``. Portable —
    DuckDB replays it bit-for-bit (q67's oracle does). Values outside
    [mn, mx] are clamped so late rows can't overflow the code space;
    NULLs stay NULL (callers sort NULLS FIRST / prune conservatively).
    """
    if mx < mn:
        raise ValueError(f"empty bucket range [{mn}, {mx}]")
    b = (F.col(col) if isinstance(col, str) else col).cast("long")
    width = mx - mn + 1
    # least/greatest SKIP nulls in Spark, so clamp only non-null rows
    clamped = F.greatest(F.least(b, F.lit(mx)), F.lit(mn))
    a = (clamped - F.lit(mn)) * F.lit(1 << bits)
    # exact integer floor-division: (a - a mod w) / w — the double
    # division is then of an exact multiple, so no engine can round a
    # boundary differently (DuckDB replays it as plain `a // w`)
    q = (a - F.pmod(a, F.lit(width))) / F.lit(width)
    return F.when(b.isNotNull(), q.cast("long"))


def quantile_bounds(
    df: DataFrame, col: str, bits: int, relative_error: float = 0.001
) -> list[float]:
    """Equal-population bucket boundaries: the (i/2^bits)-quantiles,
    deduplicated (a hot value spanning several quantiles yields fewer,
    wider buckets rather than empty ones). Driver-side list, at most
    2^bits - 1 floats."""
    nb = 1 << bits
    probs = [i / nb for i in range(1, nb)]
    qs = df.stat.approxQuantile(col, probs, relative_error)
    out: list[float] = []
    for q in qs:
        if not out or q > out[-1]:
            out.append(q)
    return out


def bucket_from_bounds(col: Column | str, bounds: list[float]) -> Column:
    """Bucket id = number of boundaries <= value, as a BALANCED
    binary-search WHEN-tree over the literal boundaries (JVM,
    codegen; no UDF, no join): O(log n) comparisons per row. The
    original array-fold formulation cost O(n) per row — at 255
    boundaries that was ~2B extra comparisons per pass over an
    8M-row input, measured as the dominant cost of the packing
    prefix sum's bucketing passes (r5)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    if not bounds:
        return F.when(c.isNotNull(), F.lit(0)).cast("long")

    def tree(lo: int, hi: int) -> Column:
        # answer (bucket id) is known to lie in [lo, hi]
        if lo == hi:
            return F.lit(lo).cast("long")
        mid = (lo + hi + 1) // 2
        return F.when(
            c >= F.lit(float(bounds[mid - 1])), tree(mid, hi)
        ).otherwise(tree(lo, mid - 1))

    return F.when(c.isNotNull(), tree(0, len(bounds)))


def interleave_bits(buckets: list[Column], bits: int) -> Column:
    """Morton code: bit i of bucket j lands at position
    ``i * n_cols + j`` (LSB-first round-robin), so all columns share
    the high-order bits equally — the property that makes rectangle
    queries touch contiguous z-ranges. Null in ANY bucket nulls the
    code (callers keep those rows; stats record [None, None] and
    range predicates prune them conservatively)."""
    n = len(buckets)
    if n * bits > MAX_TOTAL_BITS:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} interleaved bits "
            f"> {MAX_TOTAL_BITS} (shrink bits or columns)"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                i * n + j,
            )
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    how: str = "quantile",
    int_ranges: dict[str, tuple[int, int]] | None = None,
    relative_error: float = 0.001,
) -> tuple[Column, dict]:
    """Build the z-value Column for ``df[cols]`` plus a JSON-able
    description of how it was derived (recorded in compaction meta so
    a reader can see WHICH layout a snapshot carries).

    ``how="quantile"`` (default): equal-population buckets from
    approxQuantile — the skew-safe scale path. ``how="int"``: exact
    integer bucketing over ``int_ranges[col]`` (or the observed
    min/max) — the portable/oracle path."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if how not in ("quantile", "int"):
        raise ValueError(f"how must be quantile|int, got {how!r}")
    buckets: list[Column] = []
    desc: dict = {"cols": list(cols), "bits": bits, "how": how}
    if how == "int":
        ranges = dict(int_ranges or {})
        missing = [c for c in cols if c not in ranges]
        if missing:
            aggs = []
            for c in missing:
                aggs += [F.min(c).alias(f"mn__{c}"), F.max(c).alias(f"mx__{c}")]
            r = df.agg(*aggs).collect()[0]
            for c in missing:
                ranges[c] = (int(r[f"mn__{c}"]), int(r[f"mx__{c}"]))
        desc["ranges"] = {c: list(ranges[c]) for c in cols}
        for c in cols:
            mn, mx = ranges[c]
            buckets.append(int_bucket(c, mn, mx, bits))
    else:
        desc["bounds"] = {}
        for c in cols:
            bounds = quantile_bounds(df, c, bits, relative_error)
            desc["bounds"][c] = bounds
            buckets.append(bucket_from_bounds(c, bounds))
    return interleave_bits(buckets, bits), desc


def zvalue_py(buckets: list[int], bits: int) -> int:
    """Driver-side reference twin of :func:`interleave_bits` (tests
    pin the Column math to this independent loop)."""
    n = len(buckets)
    z = 0
    for i in range(bits):
        for j, b in enumerate(buckets):
            z |= ((b >> i) & 1) << (i * n + j)
    return z
