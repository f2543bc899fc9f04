"""Optional Structured-Streaming ingest: WARC-dump drops → `web_pages`.

The reference pipeline is pure batch (SURVEY.md §2.9) and so is the
harvest; this module exists because a production deployment keeps the
`web_pages` Iceberg table fed by a stream of crawl drops. Shape:

  readStream(parquet dir) → watermark(warc_ts) → dropDuplicates(url)
  → append to the day-partitioned table

Late pages beyond the watermark are handled by daily idempotent
backfill (overwritePartitions), not by stream state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.web_pages import WEB_PAGES_SCHEMA


def read_page_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(drop_dir)
    )


def _quality_gate(stream: DataFrame, thresholds: dict) -> DataFrame:
    """Fused extract+Gopher-gate Arrow pass preserving the input
    schema (see ingest_pages docstring for why it is fused)."""
    from ..operators.extract_text import extract_text_bytes
    from ..operators.quality_filter import (
        GOPHER_DEFAULTS,
        _doc_signals,
        _failed_rules,
    )

    unknown = set(thresholds) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown quality rules: {sorted(unknown)}")
    th = {**GOPHER_DEFAULTS, **thresholds}

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            mask = pd.Series(
                [
                    not _failed_rules(
                        _doc_signals(extract_text_bytes(h)), th
                    )
                    for h in pdf["html"]
                ],
                index=pdf.index,
                dtype=bool,
            )
            yield pdf[mask]

    return stream.mapInPandas(gen, stream.schema)


def ingest_pages(
    spark: SparkSession,
    drop_dir: str,
    table_path: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
    canonical: bool = False,
    quality: bool | dict = False,
):
    """Start (and with available_now=True, drain) the ingest stream.
    Returns the StreamingQuery.

    ``canonical=True`` dedupes on the CANONICAL url
    (functions/urls.py) instead of the raw spelling, so
    tracking-param / case / default-port respins of one page collapse
    within the watermark window; the ``canonical_url`` column is kept
    in the table as the downstream dedup/grouping key. Off by
    default: flipping the dedup key changes which rows an existing
    checkpointed stream would admit.

    ``quality`` (True = Gopher defaults, or a thresholds dict) gates
    pages AT ingest: ONE fused Arrow pass extracts text
    (extract_text_bytes — the same pinned kernel as the batch stage)
    and evaluates the stateless Gopher rule set per page, admitting
    only keepers — junk never lands in the table, and the stored
    schema is unchanged. Fusing extract+gate into one mapInPandas
    deliberately trades the echoed html column (the batch path never
    echoes it — 3x cost there) for a single Python stage: chaining
    two mapInPandas stages in one streaming task doubles the worker
    pool, and a row-preserving verdict would otherwise need a
    stream-stream self-join. Right at ingest rates; the batch
    15_clean stage remains the auditable/high-volume path. Flipping
    ``quality`` on an EXISTING checkpoint changes which rows the
    stream admits going forward only."""
    stream = read_page_stream(spark, drop_dir).withWatermark(
        "warc_ts", watermark
    )
    if canonical:
        from ..functions.urls import canonicalize_url

        stream = stream.withColumn(
            "canonical_url", canonicalize_url(F.col("url"))
        ).dropDuplicatesWithinWatermark(["canonical_url"])
    else:
        stream = stream.dropDuplicatesWithinWatermark(["url"])
    if quality is not False and quality is not None:
        stream = _quality_gate(
            stream, quality if isinstance(quality, dict) else {}
        )
    stream = stream.withColumn("day", F.to_date("warc_ts"))
    writer = (
        stream.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("day")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
