#!/usr/bin/env python
"""Cluster entry point — the `spark-submit --py-files` deployment shape
the north rule specifies:

  zip -r kg_spark.zip knowledge_harvest_from_lms_spark
  spark-submit --py-files kg_spark.zip jobs/run_harvest.py \\
      --relations relation_info/conceptnet.json \\
      --web-pages kg.web_pages --warehouse s3://bucket/wh \\
      --checkpoints s3://bucket/ckpt --lm roberta-large

In the sandbox it runs the same pipeline on local synth data:

  python jobs/run_harvest.py --synth-pages 1000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--relations", default=None, help="relation_info JSON path")
    p.add_argument("--web-pages", default=None, help="table/path of web pages")
    p.add_argument("--synth-pages", type=int, default=0)
    p.add_argument("--warehouse", default="/tmp/kg_warehouse")
    p.add_argument("--checkpoints", default="/tmp/kg_checkpoints")
    p.add_argument("--lm", default="stub")
    p.add_argument("--max-n-ent-tuples", type=int, default=100)
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--max-ent-subwords", type=int, default=2)
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    p.add_argument(
        "--export-json", default=None, metavar="DIR",
        help="also write results in the reference layout "
             "(results/{rel_set}/{setting}/{model}/{rel}/*.json)",
    )
    p.add_argument("--rel-set", default="fixture", help="name for --export-json layout")
    p.add_argument(
        "--publish-txn", default=None, metavar="DIR",
        help="atomically publish triples/grounded/edges/vertices into "
             "a TxnLog at DIR as ONE snapshot commit (external readers "
             "never see a mixed-generation table set)",
    )
    p.add_argument(
        "--clean-corpus", default=None, metavar="JSON",
        help="enable the corpus-hygiene stage (canonical-URL "
             "latest-fetch dedup + Gopher quality gate) between "
             "extraction and harvest; value is 'default' for Gopher "
             "table-A1 thresholds or a JSON dict of overrides, e.g. "
             '\'{"min_words": 20, "max_dup_5gram_frac": null}\'',
    )
    p.add_argument(
        "--substring-dedup", default=None, metavar="JSON",
        help="enable exact-substring span dedup (Lee et al. 2021) "
             "after cleaning; value is 'default' (k=10, min_count=2) "
             "or a JSON dict, e.g. '{\"k\": 8}'",
    )
    p.add_argument(
        "--search-prompts", action="store_true",
        help="run paraphrase prompt search for relations with no "
             "searched prompts (uses the deterministic offline "
             "paraphraser unless a real one is wired in) and write the "
             "relation_info JSON back next to --export-json",
    )
    args = p.parse_args()

    from knowledge_harvest_from_lms_spark.config import HarvestConfig
    from knowledge_harvest_from_lms_spark.plans.full_pipeline import run_full_pipeline
    from knowledge_harvest_from_lms_spark.plans.report import render_summary
    from knowledge_harvest_from_lms_spark.session import get_session
    from knowledge_harvest_from_lms_spark.sources.catalog import Catalog
    from knowledge_harvest_from_lms_spark.sources.relations import (
        fixture_relations,
        relations_from_json,
    )
    from knowledge_harvest_from_lms_spark.sources.web_pages import synth_web_pages

    spark = get_session(cpus=args.cpus, app_name="kg-harvest")
    cfg = HarvestConfig(
        max_n_ent_tuples=args.max_n_ent_tuples,
        token_beam_width=args.beam_width,
        max_ent_subwords=args.max_ent_subwords,
        lm=args.lm,
        shuffle_partitions=args.cpus,
        prune_slack=3.0,
    )

    relations = (
        relations_from_json(spark, args.relations)
        if args.relations
        else fixture_relations(spark)
    )
    if args.search_prompts:
        # reference search_prompts.py entry point: fill empty prompt
        # sets by paraphrase search, persist back to relation_info JSON
        from knowledge_harvest_from_lms_spark.plans.prompt_search import (
            search_prompts_for_relations,
            searched_prompts_table,
        )
        from knowledge_harvest_from_lms_spark.sources.results_json import (
            write_relation_info_json,
        )

        def offline_paraphraser(sent: str) -> str:
            # deterministic stand-in; swap for an API client in prod
            import hashlib

            templates = [
                "it is known that {s}", "commonly, {s}",
                "as everyone agrees, {s}", "observers report that {s}",
            ]
            k = int(hashlib.blake2b(sent.encode(), digest_size=2).hexdigest(), 16)
            return templates[k % len(templates)].format(s=sent) + "."

        before = relations
        relations = search_prompts_for_relations(relations, offline_paraphraser)
        info_path = os.path.join(
            args.export_json or args.warehouse, "relation_info", f"{args.rel_set}.json"
        )
        write_relation_info_json(
            relations, info_path,
            searched_prompts=searched_prompts_table(before, relations),
        )
        print(f"searched prompts written back to {info_path}")
    if args.synth_pages:
        pages = synth_web_pages(spark, args.synth_pages)
    elif args.web_pages:
        pages = spark.read.parquet(args.web_pages)
    else:
        pages = synth_web_pages(spark, 500)

    clean = None
    if args.clean_corpus:
        import json as _json

        clean = (
            True
            if args.clean_corpus == "default"
            else _json.loads(args.clean_corpus)
        )
        if clean is None or clean is False:
            raise SystemExit(
                "--clean-corpus given but parses to null/false — use "
                "'default', '{}' (defaults, no overrides) or a JSON "
                "threshold dict"
            )
    subdedup = None
    if args.substring_dedup:
        import json as _json

        subdedup = (
            True
            if args.substring_dedup == "default"
            else _json.loads(args.substring_dedup)
        )
        if subdedup is None or subdedup is False:
            raise SystemExit(
                "--substring-dedup given but parses to null/false — "
                "use 'default', '{}' or a JSON dict like '{\"k\": 8}'"
            )
    out = run_full_pipeline(
        spark, relations, pages, args.checkpoints, cfg, clean_corpus=clean,
        substring_dedup=subdedup,
    )

    cat = Catalog(spark, args.warehouse)
    cat.save_triples(out["triples"])
    cat.save_graph(out["edges"], out["vertices"])

    if args.publish_txn:
        from knowledge_harvest_from_lms_spark.plans.full_pipeline import (
            publish_outputs_txn,
        )

        snap = publish_outputs_txn(
            spark, out, args.publish_txn,
            meta={"job": "run_harvest", "lm": args.lm},
        )
        print(f"published snapshot v{snap} at {args.publish_txn}")

    if args.export_json:
        from knowledge_harvest_from_lms_spark.sources.results_json import (
            write_reference_results,
        )

        out_dir = write_reference_results(
            out["prompt_weights"], out["triples"], args.export_json,
            rel_set=args.rel_set, model_name=args.lm,
            max_n_ent_tuples=cfg.max_n_ent_tuples,
            max_n_prompts=cfg.max_n_prompts,
            use_init_prompts=cfg.use_init_prompts,
        )
        print(f"reference-layout results at {out_dir}")

    print(render_summary(out["triples"], top_k=10, sample_k=5))
    print(
        f"triples={out['triples'].count()} edges={out['edges'].count()} "
        f"vertices={out['vertices'].count()} warehouse={args.warehouse}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
