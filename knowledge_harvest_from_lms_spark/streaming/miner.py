"""Streaming corpus triple mining — the crawl-feed path for the
pattern miners.

A web-scale KG is maintained, not rebuilt: new crawl drops arrive
continuously and the mined evidence must fold into the existing
tables without rescanning history. Both miners' outputs are COUNT
MONOIDS ((key, n) with n additive), so the streaming form is exact by
construction: each micro-batch emits its own partial counts
(`hearst_isa` / `open_ie` run unchanged on the batch — stateless,
scan-fused), partials append to the sink table, and `fold_mined`
re-aggregates partials to the same numbers a from-scratch batch run
produces. This is the `rollup_stream`/`relations` discipline applied
to the mining surface; graph maintenance then rides
`merge_into_graph` via the `as_graph_triples` adapters exactly as the
MLM harvest does.

Scale notes: per-batch work is the miners' (one scan of the BATCH,
map-side-combining aggregate); the sink grows by distinct-key rows
per batch, not corpus size, and `fold_mined` is one hash aggregate
over partials. Compaction of a long-running sink is the TxnLog
`compact()` path (txn.py) — out of scope here by design.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.hearst import hearst_isa
from ..operators.openie import open_ie


def mine_batch(
    docs: DataFrame,
    verbs: Iterable[str],
    preps: Iterable[str],
    text_col: str = "text",
) -> DataFrame:
    """One unified (subj, pred, obj, n) partial-count table for a doc
    batch: Hearst IsA triples under ``isa:<pattern>`` predicates plus
    Open IE relation phrases."""
    isa = hearst_isa(docs, text_col).select(
        F.col("hypo").alias("subj"),
        F.concat(F.lit("isa:"), F.col("pattern")).alias("pred"),
        F.col("hyper").alias("obj"),
        "n",
    )
    rel = open_ie(docs, verbs=verbs, preps=preps, text_col=text_col)
    return isa.unionByName(rel)


def mine_triples_stream(
    spark: SparkSession,
    drop_dir: str,
    out_table: str,
    checkpoint: str,
    verbs: Iterable[str],
    preps: Iterable[str],
    schema: str = "doc_id long, text string",
    available_now: bool = True,
):
    """readStream over a crawl drop dir → per-micro-batch partial
    counts appended to ``out_table``. Exactly-once via the streaming
    checkpoint: a replayed batch overwrites its own partials (batch_id
    column + idempotent dynamic overwrite would be the TxnLog path;
    here append + checkpoint suffices because foreachBatch appends are
    only re-run for batches the checkpoint has not committed)."""
    verbs = sorted(set(verbs))
    preps = sorted(set(preps))
    stream = (
        spark.readStream.schema(schema).format("parquet").load(drop_dir)
    )

    def emit(batch: DataFrame, batch_id: int) -> None:
        (
            mine_batch(batch, verbs, preps)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_table)
        )

    writer = stream.writeStream.foreachBatch(emit).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def fold_mined(spark: SparkSession, out_table: str) -> DataFrame:
    """Fold appended partials to final counts — equals the batch
    miners' output on the union of all drops (count monoid)."""
    return (
        spark.read.parquet(out_table)
        .groupBy("subj", "pred", "obj")
        .agg(F.sum("n").alias("n"))
    )
