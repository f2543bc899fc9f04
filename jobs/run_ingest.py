#!/usr/bin/env python
"""Crawl-ingest cluster entry point — WARC-dump drops streamed into
the day-partitioned `web_pages` table:

  spark-submit --py-files kg_spark.zip jobs/run_ingest.py \\
      --drops s3://bucket/crawl_drops --table s3://bucket/wh/web_pages \\
      --checkpoints s3://bucket/ckpt/ingest --canonical

Each invocation drains whatever page files landed since the last run
(availableNow trigger — works as a cron'd batch or a long-running
stream); duplicate urls within the watermark are dropped, on the
CANONICAL url with --canonical (tracking-param / case / default-port
respins collapse; streaming/ingest.py). The resulting table is what
`jobs/run_harvest.py --web-pages` consumes.

Sandbox smoke run:

  python jobs/run_ingest.py --synth-drop 200 --canonical \\
      --drops /tmp/kg_page_drops --table /tmp/kg_warehouse/web_pages \\
      --checkpoints /tmp/kg_checkpoints/ingest
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--drops", required=True, help="page-drop parquet dir (streamed)")
    p.add_argument("--table", required=True, help="day-partitioned web_pages table path")
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--watermark", default="1 hour")
    p.add_argument("--canonical", action="store_true",
                   help="dedup on the canonical url (functions/urls.py) "
                        "and keep canonical_url in the table")
    p.add_argument("--quality", default=None, metavar="JSON",
                   help="gate pages at ingest with the Gopher rule set "
                        "(one fused extract+gate Arrow pass; junk never "
                        "lands in the table). 'default' or a JSON "
                        "threshold-override dict")
    p.add_argument("--synth-drop", type=int, default=0,
                   help="write N synthetic pages into --drops first (sandbox)")
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    args = p.parse_args()

    from knowledge_harvest_from_lms_spark.session import get_session
    from knowledge_harvest_from_lms_spark.streaming.ingest import ingest_pages

    spark = get_session(cpus=args.cpus, app_name="kg-ingest")
    if args.synth_drop:
        from knowledge_harvest_from_lms_spark.sources.web_pages import (
            synth_web_pages,
        )

        synth_web_pages(spark, args.synth_drop).write.mode("append").parquet(
            args.drops
        )

    quality = False
    if args.quality:
        import json as _json

        quality = (
            True if args.quality == "default" else _json.loads(args.quality)
        )
        if quality is not True and not isinstance(quality, dict):
            raise SystemExit(
                "--quality must be 'default' or a JSON threshold DICT "
                f"(got {type(quality).__name__}: {args.quality!r})"
            )
    q = ingest_pages(
        spark, args.drops, args.table, args.checkpoints,
        watermark=args.watermark, canonical=args.canonical,
        quality=quality,
    )
    q.awaitTermination()
    # a drain that admitted no rows is a normal cron outcome (job
    # scheduled before the first drop lands). The streaming sink
    # still creates the table dir with only _spark_metadata inside,
    # so an existence check is not enough — the schema-less read
    # itself must be tolerated. Report 0, don't crash.
    from pyspark.errors import AnalysisException

    try:
        out = spark.read.parquet(args.table)
        n = out.count()
        days = out.select("day").distinct().count()
    except AnalysisException:
        n = days = 0
    print(f"web_pages={n} rows across {days} day partitions at {args.table}")


if __name__ == "__main__":
    main()
