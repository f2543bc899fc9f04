#!/usr/bin/env python
"""Streaming relation-harvest cluster entry point — new relation
definitions arriving as drops, harvested incrementally:

  spark-submit --py-files kg_spark.zip jobs/run_relation_stream.py \\
      --drops s3://bucket/relation_drops --out s3://bucket/wh/kg \\
      --checkpoints s3://bucket/ckpt/relations

Each invocation drains whatever relation_info records landed since the
last run (availableNow trigger — works as a cron'd batch or a
long-running stream) and beam-harvests ONLY relations not yet in the
harvested-rels ledger; replayed or duplicate drops are no-ops
(streaming/relations.py).

Sandbox smoke run:

  python jobs/run_relation_stream.py --synth-drop 2 \\
      --drops /tmp/kg_rel_drops --out /tmp/kg_warehouse/relstream \\
      --checkpoints /tmp/kg_checkpoints/relations
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--drops", required=True, help="relation_info parquet drop dir (streamed)")
    p.add_argument("--out", required=True, help="output dir (triples/ + harvested_rels/)")
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--graph", default=None,
                   help="optional graph dir: maintain vertices/ + edges/ incrementally")
    p.add_argument("--max-n-ent-tuples", type=int, default=100)
    p.add_argument("--token-beam-width", type=int, default=12)
    p.add_argument("--max-ent-subwords", type=int, default=1)
    p.add_argument("--lm", default="stub", help='"stub" | HF model name on real clusters')
    p.add_argument("--txn", action="store_true",
                   help="atomic per-batch commits: ledger + graph + indexes "
                        "land in one TxnLog generation under --out (crash "
                        "anywhere leaves the previous generation intact)")
    p.add_argument("--maintain", action="store_true",
                   help="with --txn: after the drain, compact append tables "
                        "whose generation-dir count exceeds --maintain-max-dirs "
                        "(one dir accrues per micro-batch) and vacuum old "
                        "snapshots — the routine small-file maintenance pass")
    p.add_argument("--maintain-max-dirs", type=int, default=8)
    p.add_argument("--synth-drop", type=int, default=0,
                   help="write the first N fixture relations into --drops first (sandbox)")
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    args = p.parse_args()

    from knowledge_harvest_from_lms_spark.config import HarvestConfig
    from knowledge_harvest_from_lms_spark.session import get_session
    from knowledge_harvest_from_lms_spark.streaming.relations import (
        RELATION_DROP_SCHEMA,
        harvest_relation_stream,
        harvested_rels,
    )

    spark = get_session(cpus=args.cpus, app_name="kg-relation-stream")
    if args.synth_drop:
        from pyspark.sql import Row

        from knowledge_harvest_from_lms_spark.sources.fixtures import (
            FIXTURE_RELATIONS,
        )

        rows = [
            Row(
                rel=r["rel"],
                init_prompts=list(r["init_prompts"]),
                prompts=list(r.get("prompts", [])),
                seed_ent_tuples=[list(t) for t in r["seed_ent_tuples"]],
            )
            for r in FIXTURE_RELATIONS[: args.synth_drop]
        ]
        spark.createDataFrame(rows, RELATION_DROP_SCHEMA).write.mode(
            "append"
        ).parquet(args.drops)

    cfg = HarvestConfig(
        max_n_ent_tuples=args.max_n_ent_tuples,
        token_beam_width=args.token_beam_width,
        max_ent_subwords=args.max_ent_subwords,
        lm=args.lm,
        shuffle_partitions=max(2 * args.cpus, 8),
    )
    q = harvest_relation_stream(
        spark, args.drops, args.out, args.checkpoints, cfg,
        graph_dir=args.graph, txn=args.txn,
    )
    q.awaitTermination()
    from knowledge_harvest_from_lms_spark.fsutil import hadoop_exists

    if args.maintain and args.txn:
        from knowledge_harvest_from_lms_spark.txn import TxnLog, is_txn_root, maintain

        if is_txn_root(spark, args.out):
            stats = maintain(
                TxnLog(spark, args.out), max_dirs=args.maintain_max_dirs
            )
            print(
                f"maintain: compacted={stats['compacted']} "
                f"vacuumed={stats['vacuumed']} paths"
            )

    done = sorted(harvested_rels(spark, args.out))
    # a drain that found no new drops is a normal cron outcome: the
    # triples table may not exist yet — report 0, don't crash
    tpath = os.path.join(args.out, "triples")
    n = spark.read.parquet(tpath).count() if hadoop_exists(spark, tpath) else 0
    msg = f"harvested_rels={done}; triples={n} rows at {tpath}"
    if args.graph:
        if args.txn:
            from knowledge_harvest_from_lms_spark.txn import TxnLog

            log = TxnLog(spark, args.out)
            if log.has_table("vertices"):
                nv = log.read("vertices").count()
                ne = log.read("edges").count()
                msg += f"; graph: {nv} vertices, {ne} edges in txn log at {args.out}"
            else:
                msg += "; graph: not yet created"
        else:
            vpath = os.path.join(args.graph, "vertices")
            if hadoop_exists(spark, vpath):
                nv = spark.read.parquet(vpath).count()
                ne = spark.read.parquet(os.path.join(args.graph, "edges")).count()
                msg += f"; graph: {nv} vertices, {ne} edges at {args.graph}"
            else:
                msg += "; graph: not yet created"
    print(msg)
    spark.stop()


if __name__ == "__main__":
    main()
