"""Mergeable distinct-count sketches: k-minimum-values (KMV).

`approx_count_distinct` gives Spark an HLL, but its register layout
is opaque — it cannot be persisted per partition/day and re-merged in
SQL, and no second engine can replay it. KMV (Bar-Yossef et al. 2002;
the theta-sketch core) is the simplest MERGEABLE alternative: hash
every key into [0, M), keep the k smallest distinct hashes; then

    est = (k - 1) * M / h_(k)        (h_(k) = k-th smallest hash)

with relative error ~ 1/sqrt(k-2). Everything about it is exact set
algebra, so sketches union by re-taking the k smallest of the
concatenation — associative, commutative, idempotent — and a DuckDB
oracle can replay the whole pipeline row-for-row (q61).

Plan shape: the k-min runs as a rank-limit window DIRECTLY on the
raw (group, hash) stream — dense_rank (duplicate-hash safe) <= k,
which Spark compiles to WindowGroupLimit with a map-side PARTIAL
top-k per input partition BEFORE the shuffle: shuffle volume is
~k rows per partition per group, the map-combine a hand-built sketch
accumulator would do (a distinct-first plan would instead shuffle
every distinct (group, hash) pair). The <= k*dups survivors then
dedup and rank into the |groups| * k sketch table at trivial cost.

Hashers mirror operators/sampling.py: "xxhash64" (JVM, codegen — the
production path) and "portable" (polynomial, DuckDB-replayable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_M = 1_000_000_007          # portable-hash modulus == hash space size
_M_XX = 2**64               # xxhash64 mapped to [0, 2^64) via unsigned


# (multiplier, xor-shift) avalanche rounds after the polynomial fold.
# The fold alone leaves short keys on a low-dimensional lattice —
# fine for q50's mod-1000 bucketing, fatal for k-min ORDER statistics
# (a 10k-int key set read ~2x low). Each round is a multiply mod M
# (bijective spread; operands < 2^62, exact BIGINT in both engines)
# then h ^= h >> s (breaks the arithmetic-progression structure).
_MIX_ROUNDS = ((2246822519, 15), (2654435761, 13), (3266489917, 16))


def _avalanche(h: Column) -> Column:
    for a, s in _MIX_ROUNDS:
        h = (h * F.lit(a)) % F.lit(_M)
        h = h.bitwiseXOR(F.shiftright(h, s))
    # xor can land in [M, 2^30): one last multiplicative fold back
    # (residual collisions are birthday-level, ~1e-9 of pairs)
    return (h * F.lit(97)) % F.lit(_M)


def kmv_hash(key: Column, seed: int = 0, hasher: str = "portable") -> Column:
    """Stable hash of `key` in [0, M). Collisions under-count
    distincts; M = 1e9+7 (portable) keeps them negligible below ~1e8
    distincts per group — use "xxhash64" (M = 2^64) beyond that."""
    if hasher == "portable":
        s = F.concat(key.cast("string"), F.lit(f"#{int(seed)}"))
        fold = F.aggregate(
            F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * 31 + x) % F.lit(_M),
        )
        return _avalanche(fold)
    if hasher == "xxhash64":
        h = F.xxhash64(key.cast("string"), F.lit(int(seed)))
        # signed 64-bit -> [0, 2^64) order-preservingly: flip the sign
        # bit. Decimal(20,0) holds the unsigned range exactly (2^63
        # exceeds a Java long literal, hence the string literal).
        return (
            h.cast("decimal(20,0)")
            + F.lit("9223372036854775808").cast("decimal(20,0)")
        )
    raise ValueError(f"unknown hasher {hasher!r} (portable|xxhash64)")


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    k: int = 64,
    seed: int = 0,
    hasher: str = "portable",
) -> DataFrame:
    """Per-group KMV sketch: (group_cols..., pos, h) with pos = 1..k
    over the k smallest DISTINCT hashes. A group with fewer than k
    distinct keys keeps them all (its estimate is then exact)."""
    if k < 3:
        raise ValueError(f"k must be >= 3 for the estimator, got {k}")
    hashed = df.select(*group_cols, kmv_hash(key, seed, hasher).alias("h"))
    # NULL keys hash to NULL, which would sort first (NULLS FIRST) and
    # occupy a phantom sketch slot; countDistinct ignores NULLs — match
    # that contract.
    return _kmin(hashed.filter(F.col("h").isNotNull()), group_cols, k)


def _kmin(hashes: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    w = W.partitionBy(*group_cols).orderBy(F.asc("h"))
    # dense_rank (not row_number): duplicate hashes of the same key
    # must not eat sketch slots — and it keeps the WindowGroupLimit
    # map-side partial applicable on the raw duplicated stream.
    survivors = (
        hashes.withColumn("_dr", F.dense_rank().over(w))
        .filter(F.col("_dr") <= k)
        .select(*group_cols, "h")
        .distinct()
    )
    return survivors.withColumn("pos", F.row_number().over(w))


def kmv_merge(
    sketches: list[DataFrame], group_cols: list[str], k: int
) -> DataFrame:
    """Union KMV sketches (same k, seed, hasher) into one: distinct
    hashes, re-take the k smallest per group. The lossless union of
    the underlying sets restricted back to k — the property that lets
    per-partition / per-day sketches roll up to any coarser grain."""
    allh = sketches[0].select(*group_cols, "h")
    for s in sketches[1:]:
        allh = allh.unionByName(s.select(*group_cols, "h"))
    return _kmin(allh, group_cols, k)


def histogram_sketch(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    bins: int = 64,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Fixed-boundary equi-width histogram: (group_cols..., bin, cnt).
    Fixed boundaries make it MERGEABLE by plain count addition (the
    same monoid argument as rollup partials) and exactly replayable —
    unlike approxQuantile's Greenwald-Khanna state, which is neither.
    Out-of-range values clamp to the edge bins (they still count);
    ONE map-side-combining aggregate. NULL values are ignored."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / bins
    raw = F.floor((value.cast("double") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.filter(value.isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantile(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    bins: int = 64,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """(group_cols..., q, est): linear-interpolated quantile estimates
    from the histogram — error bounded by one bin width. The rank is
    r = q*(n-1)+1 (the 'linear' / type-7 convention); est walks the
    cumulative counts to the bin containing r and interpolates inside
    it. All integer/rational arithmetic until the final rounding, so
    a SQL replay agrees exactly (q65)."""
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"qs must be fractions in [0, 1], got {qs}")
    width = (hi - lo) / bins
    w = W.partitionBy(*group_cols).orderBy("bin")
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(W.partitionBy(*group_cols))
    )
    qdf = cum.crossJoin(
        F.broadcast(
            cum.sparkSession.createDataFrame(
                [(float(q),) for q in qs], "q double"
            )
        )
    )
    rank = F.col("q") * (F.col("n") - 1) + 1  # type-7 target rank
    hit = qdf.filter(
        (F.col("cum") >= rank) & ((F.col("cum") - F.col("cnt")) < rank)
    )
    frac = (rank - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    est = F.lit(lo) + (F.col("bin") + frac) * F.lit(width)
    return hit.select(
        *group_cols, "q", F.round(est, 6).alias("est")
    )


def cm_sketch(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    depth: int = 3,
    width: int = 256,
    seed: int = 0,
    hasher: str = "portable",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) per group:
    ``(group_cols..., row, col, cnt)`` holding only the NONZERO
    counters of a ``depth`` x ``width`` counter matrix, where
    ``row i``'s hash is the KMV avalanche hash at ``seed + i`` taken
    mod ``width``. Point estimate = min over rows of the addressed
    counter (see :func:`cm_estimate`) — always >= the true count,
    over by at most ``2n/width`` with prob ``1 - 2^-depth``.

    Why next to KMV: KMV answers "how many DISTINCT keys", CM answers
    "how OFTEN is this key" — the two monoid sketches a corpus
    profiler ships to the driver instead of a full frequency table.
    Counters are plain counts, so sketches MERGE by addition (same
    monoid argument as histogram_sketch) across partitions, days, or
    streaming micro-batches, and a DuckDB oracle replays hash,
    counters, and estimator exactly (q81).

    Plan shape: ONE map-side-combining aggregate over the exploded
    (row, col) stream — ``depth`` rows per input row, but the group
    cardinality is capped at |groups| * depth * width regardless of
    input size, so the shuffle collapses map-side exactly like a
    histogram. NULL keys are excluded (countDistinct contract, as in
    kmv_sketch)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    rows = F.array(
        *[
            (kmv_hash(key, seed + i, hasher) % F.lit(width)).cast("int")
            for i in range(depth)
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(*group_cols, F.posexplode(rows).alias("row", "col"))
        .groupBy(*group_cols, "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(
    sketches: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Add CM sketches (same depth/width/seed/hasher) counter-wise —
    the mergeability that lets per-partition or per-day sketches roll
    up to any coarser grain without touching raw rows."""
    allc = sketches[0].select(*group_cols, "row", "col", "cnt")
    for s in sketches[1:]:
        allc = allc.unionByName(s.select(*group_cols, "row", "col", "cnt"))
    return allc.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    key: Column,
    depth: int = 3,
    width: int = 256,
    seed: int = 0,
    hasher: str = "portable",
) -> DataFrame:
    """Point-estimate the count of each probe key per group:
    ``(group_cols..., <probe cols>, est)`` with
    ``est = min_i sketch[i][h_i(key)]`` (0 when any addressed counter
    is absent — the key was never seen). ``probes`` must carry
    ``group_cols`` plus the key column and is expected to be small (a
    head-key / watchlist table); the sketch — itself bounded at
    |groups| * depth * width rows — joins it without touching the raw
    corpus."""
    missing = [c for c in group_cols if c not in probes.columns]
    if missing:
        raise ValueError(f"probes must carry group cols, missing {missing}")
    rows = F.array(
        *[
            (kmv_hash(key, seed + i, hasher) % F.lit(width)).cast("int")
            for i in range(depth)
        ]
    )
    addressed = probes.select("*", F.posexplode(rows).alias("row", "col"))
    joined = addressed.join(
        sketch.withColumnRenamed("cnt", "_cnt"),
        on=[*group_cols, "row", "col"],
        how="left",
    )
    out_cols = [c for c in probes.columns if c not in group_cols]
    return joined.groupBy(*group_cols, *out_cols).agg(
        F.min(F.coalesce(F.col("_cnt"), F.lit(0))).alias("est")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int,
    hasher: str = "portable",
) -> DataFrame:
    """(group_cols..., n_kept, est_distinct). Groups that filled the
    sketch use (k-1)*M/h_(k); under-full groups are exact (= n_kept)."""
    space = float(_M if hasher == "portable" else _M_XX)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.when(F.col("pos") == k, F.col("h"))).alias("h_k"),
    )
    est = F.when(
        F.col("h_k").isNotNull(),
        F.round((F.lit(k - 1)) * F.lit(space) / F.col("h_k").cast("double"), 3),
    ).otherwise(F.col("n_kept").cast("double"))
    return agg.select(*group_cols, "n_kept", est.alias("est_distinct"))


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) as a register-max DataFrame monoid
# ---------------------------------------------------------------------------
#
# Spark's approx_count_distinct IS an HLL, but its binary register
# blob is opaque: it cannot be persisted per partition/day and
# re-merged in SQL, and no second engine can replay it (the same gap
# KMV fills above). This HLL keeps the registers as ROWS
# (group..., j, r) so the sketch is a plain max-monoid: merge = union
# + groupBy(j).max(r), associative/commutative/idempotent, and the
# whole pipeline — hash, register index, rank, estimator, small-range
# correction — replays row-for-row in DuckDB (q87).
#
# vs KMV: HLL state is m registers REGARDLESS of stream size (KMV
# keeps k hashes but must see them; both are O(1) state) — the real
# difference is error/state: HLL hits ~1.04/sqrt(m) with 6-bit
# registers where KMV needs full hashes, so at equal bytes HLL is
# ~8x more accurate. We pay rows (j, r) for replayability; at
# |groups| * m rows the table is still dim-sized by construction.
#
# Exactness: the harmonic-mean denominator sum(2^-r) is computed as
# an INTEGER — each register contributes 2^(RMAX - r) with
# RMAX = W_BITS + 1 >= r, absent registers contribute 2^RMAX — so
# grain re-aggregation / engine replay cannot reorder float addition
# (the q63 decimal trick, applied to HLL). The only floats are the
# single publication divide and the small-range ln(m/z), both
# rounded to 3 decimals.

_HLL_P = 8                       # default 2^8 = 256 registers
_HLL_W_BITS = 30 - _HLL_P        # h < 2^30 (< _M), so w = h div m < 2^22


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    p: int = _HLL_P,
    seed: int = 0,
) -> DataFrame:
    """Per-group HLL registers ``(group_cols..., j, r)`` over the
    portable avalanche hash: ``j = h mod 2^p`` indexes the register,
    ``w = h div 2^p`` feeds the rank ``r = W_BITS - bitlen(w) + 1``
    (w == 0 -> W_BITS + 1), register value = max rank seen. Only
    nonzero registers materialize. ONE map-side-combining aggregate;
    NULL keys are ignored (countDistinct contract, as kmv_sketch)."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    m = 1 << p
    w_bits = 30 - p
    h = kmv_hash(key, seed, "portable")
    hashed = (
        df.select(*group_cols, h.alias("_h"))
        .filter(F.col("_h").isNotNull())
        .select(
            *group_cols,
            (F.col("_h") % F.lit(m)).cast("int").alias("j"),
            F.floor(F.col("_h") / F.lit(m)).cast("bigint").alias("_w"),
        )
    )
    rank = F.when(F.col("_w") == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(F.col("_w"))) + 1
    )
    return (
        hashed.select(*group_cols, "j", rank.cast("int").alias("r"))
        .groupBy(*group_cols, "j")
        .agg(F.max("r").alias("r"))
    )


def hll_merge(
    sketches: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Union HLL register tables (same p, seed) into one: max per
    (group, j). The lossless union — per-partition / per-day sketches
    roll up to any coarser grain, exactly as kmv_merge."""
    allr = sketches[0].select(*group_cols, "j", "r")
    for s in sketches[1:]:
        allr = allr.unionByName(s.select(*group_cols, "j", "r"))
    return allr.groupBy(*group_cols, "j").agg(F.max("r").alias("r"))


def hll_estimate(
    sketch: DataFrame, group_cols: list[str], p: int = _HLL_P
) -> DataFrame:
    """(group_cols..., n_regs, est_distinct). Raw estimate
    alpha_m * m^2 / sum_j 2^(-r_j) with the integer-numerator
    denominator described above; groups in the small range
    (raw <= 2.5m with empty registers) switch to linear counting
    m * ln(m / zeros). Rounded to 3 decimals at publication."""
    m = 1 << p
    w_bits = 30 - p
    rmax = w_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {
        16: 0.673, 32: 0.697, 64: 0.709
    }.get(m, 0.7213 / (1.0 + 1.079 / m))
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        # integer harmonic numerator: sum over PRESENT registers of
        # 2^(RMAX - r); r <= RMAX so every term is a positive BIGINT
        # (F.shiftleft takes only a literal bit count, hence F.expr)
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - r)"))
        .alias("_s_present"),
    )
    zeros = F.lit(m) - F.col("n_regs")
    denom = (F.col("_s_present") + zeros * F.lit(1 << rmax)).cast("double")
    raw = F.lit(alpha * m * m * float(1 << rmax)) / denom
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), small
    ).otherwise(raw)
    return agg.select(
        *group_cols, "n_regs", F.round(est, 3).alias("est_distinct")
    )
