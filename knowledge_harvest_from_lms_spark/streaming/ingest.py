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


def ingest_pages(
    spark: SparkSession,
    drop_dir: str,
    table_path: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
    canonical: bool = False,
):
    """Start (and with available_now=True, drain) the ingest stream.
    Returns the StreamingQuery.

    ``canonical=True`` dedupes on the CANONICAL url
    (functions/urls.py) instead of the raw spelling, so
    tracking-param / case / default-port respins of one page collapse
    within the watermark window; the ``canonical_url`` column is kept
    in the table as the downstream dedup/grouping key. Off by
    default: flipping the dedup key changes which rows an existing
    checkpointed stream would admit."""
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
