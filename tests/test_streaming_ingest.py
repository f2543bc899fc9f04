"""Streaming ingest: drop dir → availableNow drain → day-partitioned
table, duplicate urls within watermark dropped."""

from knowledge_harvest_from_lms_spark.sources.web_pages import (
    synth_web_pages,
    write_web_pages,
)
from knowledge_harvest_from_lms_spark.streaming.ingest import ingest_pages


def test_ingest_available_now(spark, tmp_path):
    drop = str(tmp_path / "drop")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    pages = synth_web_pages(spark, 120, seed=42, n_partitions=3)
    # write the drop twice: second batch is pure duplicates
    pages.write.mode("overwrite").parquet(drop)

    q = ingest_pages(spark, drop, table, ckpt, available_now=True)
    q.awaitTermination(120)

    out = spark.read.parquet(table)
    assert out.count() == 120
    assert "day" in out.columns
    # restart on the same checkpoint: no files left to process → no dupes
    q2 = ingest_pages(spark, drop, table, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(table).count() == 120

    # new crawl drop with FRESH timestamps (inside the watermark):
    # restart ingests exactly the new rows
    from pyspark.sql import functions as F

    late = (
        synth_web_pages(spark, 300, seed=42, n_partitions=2)
        .filter("url like '%/p/2__'")  # ids 200-299: urls disjoint from first 120
        .withColumn("warc_ts", F.expr("timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0, cast(substring_index(url,'/',-1) as int))"))
    )
    n_late = late.count()
    late.write.mode("append").parquet(drop)
    q3 = ingest_pages(spark, drop, table, ckpt, available_now=True)
    q3.awaitTermination(120)
    total = spark.read.parquet(table).count()
    assert total == 120 + n_late, (total, n_late)

    # a drop with timestamps far behind the watermark is treated as
    # late data and excluded from the stream (backfill path instead)
    stale = late.withColumn(
        "warc_ts", F.expr("timestamp'2020-01-01 00:00:00'")
    ).withColumn("url", F.concat("url", F.lit("-stale")))
    stale.write.mode("append").parquet(drop)
    q4 = ingest_pages(spark, drop, table, ckpt, available_now=True)
    q4.awaitTermination(120)
    assert spark.read.parquet(table).count() == total
