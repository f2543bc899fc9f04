#!/usr/bin/env python
"""Incremental-grounding cluster entry point — the streaming half of
the `spark-submit --py-files` surface:

  spark-submit --py-files kg_spark.zip jobs/run_incremental.py \\
      --drops s3://bucket/crawl_drops --triples s3://bucket/wh/triples \\
      --totals s3://bucket/wh/mention_totals \\
      --reranked s3://bucket/wh/triples_support_ranked \\
      --checkpoints s3://bucket/ckpt/incremental

Each invocation drains whatever new crawl drops landed since the last
run (availableNow trigger — works as a cron'd batch or a long-running
stream), updates per-entity running mention totals through the
stateful operator, and refreshes the corpus-support ranking for ONLY
the relations whose entities changed.

Sandbox smoke run:

  python jobs/run_harvest.py --synth-pages 500      # produce triples
  python jobs/run_incremental.py --synth-drop 200 \\
      --triples /tmp/kg_warehouse/kg/triples
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--drops", default="/tmp/kg_drops", help="crawl-drop parquet dir (streamed)")
    p.add_argument("--triples", default=None, help="harvested triples parquet")
    p.add_argument("--harvest-root", default=None,
                   help="TxnLog root written by run_relation_stream --txn: "
                        "triples are read from <root>/triples and the rerank "
                        "runs CDC off the ledger changelog, committing the "
                        "ranking back into the log (table 'reranked')")
    p.add_argument("--totals", default="/tmp/kg_warehouse/mention_totals")
    p.add_argument("--reranked", default="/tmp/kg_warehouse/triples_support_ranked")
    p.add_argument("--checkpoints", default="/tmp/kg_checkpoints/incremental")
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--txn-totals", action="store_true",
                   help="make --totals a TxnLog root: the totals upsert and "
                        "the changed-entity delta commit atomically per "
                        "micro-batch (the plain layout can lose the delta "
                        "to a crash between the two writes); the rerank "
                        "then consumes the delta by CDC")
    p.add_argument("--maintain-totals", action="store_true",
                   help="after the rerank, compact+vacuum the totals "
                        "TxnLog (requires --txn-totals), protecting the "
                        "rerank consumer's CDC cursor — the cursor lives "
                        "in the HARVEST log's meta, so totals-log "
                        "maintenance can't discover it on its own")
    p.add_argument("--min-mentions", type=int, default=1)
    p.add_argument("--synth-drop", type=int, default=0,
                   help="write N synthetic pages into --drops first (sandbox)")
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    args = p.parse_args()

    from knowledge_harvest_from_lms_spark.session import get_session
    from knowledge_harvest_from_lms_spark.sources.web_pages import (
        WEB_PAGES_SCHEMA,
        synth_web_pages,
    )
    from knowledge_harvest_from_lms_spark.streaming.incremental import (
        grounded_view,
        incremental_rerank,
        incremental_rerank_txn,
        start_incremental_grounding,
    )

    if (args.triples is None) == (args.harvest_root is None):
        p.error("exactly one of --triples / --harvest-root is required")
    spark = get_session(cpus=args.cpus, app_name="kg-incremental")
    if args.synth_drop:
        synth_web_pages(spark, args.synth_drop).write.mode("append").parquet(args.drops)

    triples_path = args.triples or args.harvest_root.rstrip("/") + "/triples"
    triples = spark.read.parquet(triples_path)
    stream = spark.readStream.schema(WEB_PAGES_SCHEMA).parquet(args.drops)
    q = start_incremental_grounding(
        spark, stream, triples, args.totals, args.checkpoints,
        track_changes=True, txn=args.txn_totals,
    )
    q.awaitTermination()

    if args.harvest_root:
        reranked = incremental_rerank_txn(
            spark, args.harvest_root, args.totals, alpha=args.alpha
        )
    else:
        reranked = incremental_rerank(
            spark, triples, args.totals, args.reranked, alpha=args.alpha
        )
    if args.maintain_totals:
        if not args.txn_totals:
            p.error("--maintain-totals requires --txn-totals")
        from knowledge_harvest_from_lms_spark.streaming.incremental import (
            totals_cursor,
        )
        from knowledge_harvest_from_lms_spark.txn import TxnLog, maintain

        protect = set()
        if args.harvest_root:
            cur = totals_cursor(spark, args.harvest_root)
            if cur is not None:
                protect.add(cur)
        stats = maintain(TxnLog(spark, args.totals), protect=protect)
        print(
            f"maintain totals: compacted={stats['compacted']} "
            f"vacuumed={stats['vacuumed']} paths; protected={sorted(protect)}"
        )
    grounded = grounded_view(spark, triples, args.totals, args.min_mentions)
    where = (
        f"{args.harvest_root} (log table 'reranked')"
        if args.harvest_root
        else args.reranked
    )
    print(
        f"reranked={reranked.count()} rows at {where}; "
        f"grounded(min_mentions={args.min_mentions})={grounded.count()} "
        f"triples; totals at {args.totals}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
