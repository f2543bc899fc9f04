"""Leakage-safe dataset splits and per-group quota caps.

Two curation moves every training-data pipeline makes right before
materializing a corpus, both absent from Spark as built-ins:

* **Group-integrity train/val/test split** — assigning SPLITS per
  row leaks: near-duplicate pages from one host (or shards of one
  document) land on both sides of the train/eval fence and the eval
  set stops measuring generalization. The split decision must be a
  pure function of the GROUP key (url host, document family, user),
  so every row of a group lands in the same split. Built on the same
  stable-hash machinery as ``operators/sampling.py``: bucket =
  hash(group, seed) mod 1000, split = cumulative-threshold CASE
  chain — a scan-fused codegen projection, no shuffle, no RNG state,
  immune to retries/AQE/partition count, and replayable in DuckDB
  via the portable hasher (the q74 oracle).

* **Per-group quota cap** (C4/CCNet-style "at most N pages per
  host") — a deterministic pseudo-random rank inside each group,
  keep rank <= n. The rank orders by the stable avalanche hash of
  the ROW id (``operators/sketches.kmv_hash`` — seeded, so disjoint
  seeds give independent draws; id tie-break makes ties impossible
  to matter), which makes the kept subset a uniform without-
  replacement sample per group, fixed forever. Plan shape: the
  ``row_number <= n`` filter compiles to WindowGroupLimit with a
  map-side **Partial** below the exchange (asserted in
  tests/test_splits.py, same contract as the KMV sketch), so a
  10^6-page host ships ~n rows per input partition into the
  shuffle, not its whole crawl.

At 100 TB: both operators add zero corpus-wide shuffles beyond the
quota cap's single per-group exchange (bounded by n x partitions per
group); the split is pure projection. Driver state: the split
thresholds (a handful of literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .sampling import sample_bucket
from .sketches import kmv_hash


def assign_split(
    df: DataFrame,
    group_col: str,
    splits: dict[str, float],
    seed: int = 0,
    hasher: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Append ``out_col``: the split name for this row's GROUP.

    ``splits`` maps name -> weight; weights must sum to 1.0 (within
    1e-9). Boundaries are integer thousandths — cumulative in the
    dict's iteration order, with the LAST split absorbing the
    rounding remainder so the full [0, 1000) bucket range is always
    covered (weights finer than 0.001 need a wider bucket space, so
    they are rejected rather than silently collapsed). NULL groups
    get a NULL split (no group, no fence — filter upstream)."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    for name, w in splits.items():
        if w <= 0:  # incl. the LAST split — the sum check alone would
            # let {a: 1.2, b: -0.2} silently starve b
            raise ValueError(f"split {name!r} has non-positive weight {w}")
    names = list(splits)
    cuts: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cut = int(round(acc * 1000))
        if cuts and cut == cuts[-1] or cut == 0:
            raise ValueError(
                f"split {name!r} rounds to an empty [*1000] bucket range; "
                "weights below 0.001 are not representable"
            )
        cuts.append(cut)
    b = sample_bucket(F.col(group_col), seed, hasher)
    expr = F.lit(names[-1])
    for name, cut in zip(reversed(names[:-1]), reversed(cuts)):
        expr = F.when(b < F.lit(cut), F.lit(name)).otherwise(expr)
    # trailing reversed-order WHENs nest so the FIRST matching cut
    # wins; guard NULL groups on the GROUP column itself — Spark's
    # xxhash64 SKIPS null inputs (yields the seed's hash, not NULL),
    # so a bucket-null check would silently fence NULL groups into a
    # real split
    return df.withColumn(
        out_col, F.when(F.col(group_col).isNotNull(), expr)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Keep at most ``n`` rows per group — a deterministic uniform
    without-replacement sample, ranked by the seeded stable hash of
    ``id_col`` (unique within a group; the (hash, id) order is total,
    so the kept set is partition/retry-invariant). NULL groups and
    NULL ids are excluded (no quota identity)."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = Window.partitionBy(group_col).orderBy(
        kmv_hash(F.col(id_col), seed, hasher).asc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(group_col).isNotNull() & F.col(id_col).isNotNull())
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n)
        .drop("__r")
    )
