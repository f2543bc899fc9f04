"""Bloom-filter join pruning: build a compact bitmap over the build
side's join keys, broadcast it, and drop probe rows whose key cannot
possibly match BEFORE the join's shuffle.

The classic big-join move (runtime filter / sideways information
passing — what Spark's own ``spark.sql.optimizer.runtime.bloomFilter``
injects for suitable plans, re-expressed here as an explicit,
portable, DuckDB-replayable operator the pipeline can apply where the
optimizer's heuristics decline): when a 10^12-row fact side joins a
filtered dimension whose key set is small-ish but too large or too
dynamic for a plain broadcast-hash join of the ROWS, broadcasting a
fixed-size BITMAP of the keys prunes the fact side at the scan, so
the join's exchange shuffles only rows that can match.

Scale design (100 TB lens):
- The bitmap build is ONE aggregate on the (already filtered) build
  side: k hash positions per key explode to (word_idx, bit) pairs,
  map-side ``bit_or`` partials collapse them to at most ``m/64``
  rows per partition before the exchange — the shuffle is bounded by
  the bitmap size, never the key count.
- The bitmap collects to the driver as <= m/64 longs (m = 2^16 bits
  -> 1024 longs = 8 KB; the same driver-bounded-broadcast pattern as
  the packing offset table) and rides into the probe scan as a
  LITERAL array: membership = k ``element_at``/bit-mask checks, a
  pure JVM scan-fused predicate — no shuffle, no UDF, no extra join.
- EXACTNESS is preserved by construction: a Bloom filter has false
  positives but NEVER false negatives, and the exact join still runs
  after the prune — so the operator output is hash-identical to the
  unpruned join (the q78 oracle is the PLAIN join; a bloom bug that
  dropped a true key would surface as a hash mismatch).

Hashing: k seeded avalanche hashes (operators/sketches.kmv_hash,
the q61/q75 portable recipe) mod m — replayable bit-for-bit in
DuckDB. False-positive rate ~ (1 - e^{-kn/m})^k; ``build_bloom``
raises if n/m exceeds a bound where the filter stops pruning
(fp > ~0.5) so a silently useless bitmap cannot ship.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import kmv_hash

_WORD = 64


def _bit_mask(bit: Column) -> Column:
    """1L << bit with a COLUMN shift amount — the pyspark
    ``F.shiftleft`` wrapper only takes a Python-int numBits, so this
    goes through the SQL function, which takes expressions."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), bit.cast("int")
    )


def _positions(key: Column, m_bits: int, k: int, seed: int) -> List[Column]:
    return [
        kmv_hash(key, seed=seed * 1000 + i, hasher="portable") % m_bits
        for i in range(k)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
    seed: int = 7,
    max_fill: float = 0.5,
) -> List[int]:
    """Aggregate the build side's keys into an m-bit Bloom bitmap and
    return it as ``m_bits // 64`` Python ints (driver-bounded: 8 KB
    at the default m). Raises if the set-bit fill fraction exceeds
    ``max_fill`` (fp rate = fill^k — at fill 0.5 / k=4 that is ~6%,
    past it the prune stops paying for itself; size m up instead)."""
    if m_bits % _WORD:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    keys = df.select(F.col(key_col).alias("__k")).filter(
        F.col("__k").isNotNull()
    )
    pos = F.array(*_positions(F.col("__k"), m_bits, k, seed))
    words = (
        keys.select(F.explode(pos).alias("p"))
        .select(
            (F.col("p") / _WORD).cast("int").alias("w"),
            _bit_mask(F.col("p") % _WORD).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    n_set = sum(bin(r["bits"] & ((1 << 64) - 1)).count("1") for r in words)
    if n_set > max_fill * m_bits:
        raise ValueError(
            f"bloom overloaded: {n_set}/{m_bits} bits set "
            f"(> max_fill={max_fill}); increase m_bits"
        )
    bitmap = [0] * (m_bits // _WORD)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: List[int], m_bits: int, k: int, seed: int = 7
) -> Column:
    """Scan-fused membership predicate: all k bits set in the LITERAL
    bitmap array. NULL key -> false (SQL join semantics: NULL never
    matches)."""
    arr = F.array(*[F.lit(w).cast("bigint") for w in bitmap])
    cond = key.isNotNull()
    for p in _positions(key, m_bits, k, seed):
        word = F.element_at(arr, (p / _WORD).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit_mask(p % _WORD)) != 0)
    return cond


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    how: str = "inner",
    m_bits: int = 1 << 16,
    k: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Exact ``probe JOIN build`` with the probe side pre-pruned by a
    broadcast Bloom bitmap of the build keys. Output is
    hash-identical to the plain join (false positives are removed by
    the exact join; false negatives are impossible). ``how`` is any
    join type whose result a probe-side prune preserves: "inner" or
    "left_semi"."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"how must be inner|left_semi, got {how!r}")
    bitmap = build_bloom(build, build_key, m_bits, k, seed)
    pruned = probe.filter(
        bloom_might_contain(F.col(probe_key), bitmap, m_bits, k, seed)
    )
    return pruned.join(
        build, pruned[probe_key] == build[build_key], how
    )
