"""Sequence packing for LLM training: concat-and-chunk documents
into fixed-length training sequences, driven by a DISTRIBUTED
prefix sum.

The GPT-style pretraining data layout concatenates every document's
tokens in a stable order and slices the stream into ``seq_len``
blocks; a document that straddles a block boundary contributes a
span to each block it touches. The only hard part at scale is the
exclusive prefix sum of token counts over the global document order:
the naive plan — ``sum(n) OVER (ORDER BY doc_id)`` with no
PARTITION BY — collapses the entire corpus into ONE window partition
(a single task sorting 100 TB of rows). This module computes the
same numbers with the classic two-phase parallel scan instead:

1. bucket rows into ordered ranges of the order key (equal-population
   boundaries from one ``approxQuantile`` pass — skew-resistant, and
   the boundaries only shape PARALLELISM, never the result);
2. an intra-bucket running sum (window partitioned BY BUCKET — every
   bucket scans in parallel);
3. per-bucket totals (one tiny aggregate, ≤ num_buckets rows) turned
   into exclusive bucket offsets on the driver and broadcast back.

Step 3's collect is bounded by ``num_buckets`` (hundreds of rows for
a 100 TB corpus), the same driver-bounded pattern as
``bpe_trainer``'s per-merge argmax. Total cost: one shuffle to
bucket-cluster + one bucket-local sort — identical to what a sorted
write of the packed corpus needs anyway.

Chunk/span math is pure integer Column arithmetic after that, and
engine-portable: the q70 oracle replays it in DuckDB with a plain
global window + ``generate_series``.

Reference scope note: the reference engine (knowledge-harvest-from-
lms) has no training-data packer; this operator is part of the
"operations a large-scale training-data pipeline needs" surface, on
the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.zorder import bucket_from_bounds, quantile_bounds

_B = "__psum_bucket"
_CUM = "__psum_cum"


def global_offsets(
    df: DataFrame,
    order_col: str,
    count_col: str,
    out_col: str = "global_offset",
    num_buckets: int = 256,
    bounds_sample: float = 0.05,
) -> DataFrame:
    """Append ``out_col`` = EXCLUSIVE prefix sum of ``count_col`` in
    ``order_col`` order (the first row gets 0), without ever creating
    a global single-partition window.

    ``order_col`` must be a total order (unique values) — duplicate
    keys would make "the documents before mine" ambiguous and the
    result nondeterministic — and numeric when ``num_buckets > 1``
    (the boundary pass is ``approxQuantile``); callers with string
    keys pass a numeric surrogate or ``num_buckets=1``.

    ``num_buckets`` bounds both the driver-side offsets list and the
    parallelism of the scan phase; the VALUES are invariant to it
    (tests pin buckets=1 == buckets=8).

    ``bounds_sample`` runs the boundary pass over a Bernoulli sample
    of the input instead of a full approxQuantile scan — the same
    move Spark's own RangePartitioner makes (it reservoir-samples
    the sort key): boundaries shape PARALLELISM only, never the
    values (pinned by the invariance tests), so a sampled, even
    lopsided, boundary estimate costs balance, not correctness. A
    full pass here was the dominant NON-scaling cost of the packing
    bench (a quantile sketch's driver-side merge doesn't parallelize
    with executor count). Pass 1.0 to restore the exact pass.
    """
    if order_col == count_col:
        raise ValueError("order_col and count_col must differ")
    nb = max(1, num_buckets)
    n = (F.col(count_col)).cast("long")

    if nb == 1:
        bucketed = df.withColumn(_B, F.lit(0))
        bounds: list[float] = []
    else:
        bits = max(1, (nb - 1).bit_length())
        # loose sketch error + sampled input: boundaries shape
        # PARALLELISM only, the values are invariant to them (pinned
        # by tests), so neither a tight error nor a full pass would
        # buy anything
        src = df if bounds_sample >= 1.0 else df.sample(bounds_sample, seed=7)
        bounds = quantile_bounds(src, order_col, bits, relative_error=0.01)
        bucketed = df.withColumn(
            _B, bucket_from_bounds(F.col(order_col), bounds)
        )

    w = (
        Window.partitionBy(_B)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bucketed.withColumn(_CUM, F.sum(n).over(w))

    # per-bucket totals -> exclusive bucket offsets (driver-bounded:
    # <= num_buckets rows)
    totals = (
        bucketed.groupBy(_B).agg(F.sum(n).alias("t")).orderBy(_B).collect()
    )
    off, offsets = 0, []
    for r in totals:
        offsets.append((r[_B], off))
        off += r["t"] or 0
    spark = df.sparkSession
    odf = spark.createDataFrame(offsets, f"{_B} long, __psum_off long")

    return (
        cum.join(F.broadcast(odf), _B)
        .withColumn(out_col, F.col("__psum_off") + F.col(_CUM) - n)
        .drop(_B, _CUM, "__psum_off")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    count_col: str,
    seq_len: int,
    num_buckets: int = 256,
    bounds_sample: float = 0.05,
) -> DataFrame:
    """One row per (document, training chunk) span under concat-and-
    chunk packing: columns ``order_col``, ``n_tokens``,
    ``global_offset``, ``chunk_id``, ``chunk_pos`` (where the span
    starts inside the chunk), ``doc_pos`` (where it starts inside the
    document) and ``span_len``. Zero-token documents occupy no chunk
    and are dropped (documented; filter upstream if they must
    survive). The per-document chunk fan-out is
    ``explode(sequence(first_chunk, last_chunk))`` — pure JVM, sized
    ceil(n/seq_len)+1, no Python."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    L = F.lit(int(seq_len))
    n = F.col(count_col).cast("long")
    o = global_offsets(
        df,
        order_col,
        count_col,
        num_buckets=num_buckets,
        bounds_sample=bounds_sample,
    )
    o = o.filter(n > 0).withColumn(
        "__first", (F.col("global_offset") - F.pmod(F.col("global_offset"), L)) / L
    )
    last = F.col("global_offset") + n - 1
    o = o.withColumn("__last", (last - F.pmod(last, L)) / L)
    out = o.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(F.col("__first").cast("long"), F.col("__last").cast("long"))
        ),
    )
    span_start = F.greatest(F.col("global_offset"), F.col("chunk_id") * L)
    span_end = F.least(F.col("global_offset") + n, (F.col("chunk_id") + 1) * L)
    return out.select(
        order_col,
        n.alias("n_tokens"),
        "global_offset",
        "chunk_id",
        (span_start - F.col("chunk_id") * L).alias("chunk_pos"),
        (span_start - F.col("global_offset")).alias("doc_pos"),
        (span_end - span_start).alias("span_len"),
    )
