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
