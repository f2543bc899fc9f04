#!/usr/bin/env python
"""Corpus → knowledge-graph pipeline — the mining + refinement
counterpart to jobs/run_harvest.py's MLM harvest, composing the r5
layers end-to-end in the `spark-submit --py-files` deployment shape:

  pages ──► Hearst IsA mining ──┐
      └──► Open IE mining ──────┤
                                ├─► corroborate (per-source evidence)
                                ├─► truth finding (source trust ⇄
                                │      fact confidence, bounded rounds)
                                ├─► canonicalize predicates (DIRT
                                │      paraphrases → components)
                                ├─► type signatures (IsA as the type
                                │      table over Open IE triples)
                                ├─► taxonomy induction (best parents)
                                ├─► temporal scope (validity windows
                                │      from warc_ts sightings)
                                ├─► functional audit (measured
                                │      single-valuedness + conflicts)
                                ├─► vertex/edge graph materialize
                                ├─► PRA completion (predict missing
                                │      target-rel edges from path
                                │      evidence over the graph)
                                ├─► rule mining + forward chaining
                                │      (AMIE Horn rules over the
                                │      graph → inferred conclusions)
                                ├─► completion eval (held-out hash
                                │      slice → filtered MRR/Hits@k)
                                ├─► negative samples (corrupted-tail
                                │      embedding training pairs)
                                └─► TransE embedding training
                                       (bit-stable full-batch steps)
                                       + triple energies

Cluster:
  zip -r kg_spark.zip knowledge_harvest_from_lms_spark
  spark-submit --py-files kg_spark.zip jobs/run_corpus_kg.py \\
      --pages kg.web_pages --out s3://bucket/wh/corpus_kg

Sandbox:
  python jobs/run_corpus_kg.py --synth-pages 2000 --out /tmp/corpus_kg

Every output lands as parquet under --out; the final line is ONE JSON
dict of stage row counts (machine-checkable, used by the job test).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_VERBS = [
    "married", "wed", "founded", "owns", "lives", "moved", "works",
    "leads", "borders", "joined",
]
DEFAULT_PREPS = ["in", "to", "at", "with", "for", "of"]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", default=None, help="web_pages parquet path")
    p.add_argument("--synth-pages", type=int, default=0)
    p.add_argument("--out", default="/tmp/corpus_kg")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    p.add_argument("--min-support", type=int, default=1,
                   help="min pattern support per mined triple")
    p.add_argument("--verbs", default=",".join(DEFAULT_VERBS))
    p.add_argument("--preps", default=",".join(DEFAULT_PREPS))
    p.add_argument("--min-jaccard", type=float, default=0.5,
                   help="paraphrase-merge threshold")
    p.add_argument("--truth-iters", type=int, default=3)
    p.add_argument("--functional-min", type=float, default=0.9,
                   help="min measured functionality for conflict audit")
    p.add_argument("--complete-rel", default="isa",
                   help="target relation for PRA completion")
    p.add_argument("--max-fanout", type=int, default=10_000,
                   help="hub-mid degree cap for the PRA wedge join")
    p.add_argument("--neg-k", type=int, default=2,
                   help="corrupted-tail negatives per triple")
    p.add_argument("--rule-min-support", type=int, default=2,
                   help="min support for mined Horn rules")
    p.add_argument("--rule-min-pca", type=float, default=0.5,
                   help="min PCA confidence for forward chaining")
    p.add_argument("--emb-dim", type=int, default=16,
                   help="TransE embedding dimension")
    p.add_argument("--emb-steps", type=int, default=2,
                   help="full-batch TransE training steps")
    p.add_argument("--emb-lr", type=float, default=0.05)
    p.add_argument("--emb-margin", type=float, default=1.0)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from knowledge_harvest_from_lms_spark.operators import hearst, openie
    from knowledge_harvest_from_lms_spark.operators.corroborate import (
        corroborate_triples,
    )
    from knowledge_harvest_from_lms_spark.operators.graph import (
        materialize_graph,
    )
    from knowledge_harvest_from_lms_spark.operators.kg_complete import (
        negative_samples,
        pra_score,
    )
    from knowledge_harvest_from_lms_spark.operators.kg_embed import (
        init_embeddings,
        transe_distance,
        transe_step,
    )
    from knowledge_harvest_from_lms_spark.operators.rule_mining import (
        apply_rules,
        mine_path_rules,
    )
    from knowledge_harvest_from_lms_spark.operators.kg_refine import (
        canonicalize_predicates,
        functional_violations,
        predicate_functionality,
        relation_type_signatures,
        temporal_scope,
        truth_finding,
    )
    from knowledge_harvest_from_lms_spark.operators.taxonomy import (
        induce_taxonomy,
    )
    from knowledge_harvest_from_lms_spark.session import get_session
    from knowledge_harvest_from_lms_spark.sources.web_pages import (
        synth_web_pages,
    )

    spark = get_session(cpus=args.cpus, app_name="corpus-kg")
    if args.synth_pages:
        pages = synth_web_pages(spark, args.synth_pages)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        p.error("one of --pages / --synth-pages is required")
    if "lang" in pages.columns:
        pages = pages.filter(F.col("lang") == "en")
    # the corpus is scanned by TWO miners and the sightings stream —
    # persist the (projected) text once so the scan doesn't triple
    docs = pages.select("url", "warc_ts", "text").persist()

    counts: dict[str, int] = {"pages": docs.count()}
    out = args.out
    verbs = [v for v in args.verbs.split(",") if v]
    preps = [v for v in args.preps.split(",") if v]

    def save(df, name: str) -> int:
        df.write.mode("overwrite").parquet(os.path.join(out, name))
        n = spark.read.parquet(os.path.join(out, name)).count()
        counts[name] = n
        return n

    # ---- mine ----
    isa = hearst.hearst_isa(docs, min_count=args.min_support)
    save(isa, "isa")
    rel = openie.open_ie(
        docs, verbs=verbs, preps=preps, min_count=args.min_support
    )
    save(rel, "openie")
    isa_p = spark.read.parquet(os.path.join(out, "isa"))
    rel_p = spark.read.parquet(os.path.join(out, "openie"))

    # ---- corroborate: per-source evidence row per triple ----
    evidence = (
        isa_p.select(
            F.col("hypo").alias("subj"), F.lit("isa").alias("rel"),
            F.col("hyper").alias("obj"),
            F.concat(F.lit("hearst:"), F.col("pattern")).alias("source"),
            F.col("n").cast("double").alias("weight"),
        )
        .unionByName(
            rel_p.select(
                "subj", F.col("pred").alias("rel"), "obj",
                F.lit("openie").alias("source"),
                F.col("n").cast("double").alias("weight"),
            )
        )
    )
    save(corroborate_triples(evidence), "corroborated")

    # ---- truth finding: source reliability ⇄ fact confidence ----
    claims = evidence.select(
        "subj", F.col("rel").alias("pred"), "obj", "source"
    )
    save(truth_finding(claims, n_iters=args.truth_iters), "confidence")

    # ---- canonicalize Open IE predicates via DIRT paraphrases ----
    save(
        canonicalize_predicates(rel_p, min_jaccard=args.min_jaccard),
        "canonical_triples",
    )

    # ---- schema induction: type signatures off the IsA table ----
    types = isa_p.select(
        F.col("hypo").alias("entity"), F.col("hyper").alias("type")
    )
    save(relation_type_signatures(rel_p, types), "type_signatures")

    # ---- taxonomy over the IsA counts ----
    isa_agg = isa_p.groupBy("hypo", "hyper").agg(F.sum("n").alias("n"))
    save(induce_taxonomy(isa_agg), "taxonomy")

    # ---- temporal scope from per-page sightings ----
    sightings = hearst.hearst_isa_sightings(
        docs, keep=("warc_ts",)
    ).select(
        F.col("hypo").alias("subj"), F.lit("isa").alias("pred"),
        F.col("hyper").alias("obj"),
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("ts"),
    )
    save(temporal_scope(sightings), "temporal")

    # ---- functional audit: measured single-valuedness + conflicts ----
    all_triples = claims.select("subj", "pred", "obj")
    fn = predicate_functionality(all_triples)
    save(fn, "functionality")
    fn_p = spark.read.parquet(os.path.join(out, "functionality"))
    functional_preds = fn_p.filter(
        F.col("functionality") >= args.functional_min
    ).select("pred")
    save(
        functional_violations(
            claims.join(F.broadcast(functional_preds), "pred", "leftsemi")
            .select("subj", "pred", "obj")
        ),
        "violations",
    )

    # ---- shared vertex/edge graph ----
    triples = hearst.as_graph_triples(isa_p).unionByName(
        openie.as_graph_triples(rel_p)
    )
    g = materialize_graph(triples)
    save(g["vertices"], "vertices")
    save(g["edges"], "edges")
    edges_p = spark.read.parquet(os.path.join(out, "edges"))
    verts_p = spark.read.parquet(os.path.join(out, "vertices"))

    # ---- PRA completion: predict missing target-rel edges ----
    save(
        pra_score(
            edges_p.select("src", "rel", "dst"),
            args.complete_rel,
            max_fanout=args.max_fanout,
        ),
        "completions",
    )

    # ---- AMIE rule mining + one forward-chaining step: PRA above
    # scores ONE target predicate; the rules generalize the same
    # wedge-join evidence to every (path type, head) pair, and the
    # chained conclusions are the graph's missing edges with
    # calibrated (max-PCA) confidence ----
    save(
        mine_path_rules(
            edges_p.select("src", "rel", "dst"),
            min_support=args.rule_min_support,
            max_fanout=args.max_fanout,
        ),
        "rules",
    )
    save(
        apply_rules(
            edges_p.select("src", "rel", "dst"),
            spark.read.parquet(os.path.join(out, "rules")),
            min_pca_confidence=args.rule_min_pca,
            max_fanout=args.max_fanout,
        ),
        "inferences",
    )

    # ---- evaluate the completion layer (q117 machinery): hold out
    # a deterministic hash slice of the target-rel edges, score the
    # remainder, report filtered MRR/Hits@k on the held-out slice ----
    from knowledge_harvest_from_lms_spark.operators.kg_eval import (
        filtered_ranks,
        ranking_metrics,
    )
    from knowledge_harvest_from_lms_spark.operators.sketches import (
        kmv_hash,
    )

    target = edges_p.filter(F.col("rel") == args.complete_rel).select(
        "src", "rel", "dst"
    )
    is_held = (
        F.pmod(kmv_hash(F.concat_ws("|", "src", "dst"), 41), F.lit(5)) == 0
    )
    train_edges = edges_p.filter(
        (F.col("rel") != args.complete_rel) | ~is_held
    ).select("src", "rel", "dst")
    held = target.filter(is_held)
    cand = pra_score(
        train_edges, args.complete_rel, max_fanout=args.max_fanout
    ).select(
        F.col("src").alias("subj"),
        F.lit(args.complete_rel).alias("pred"),
        F.col("dst").alias("obj"),
        "score",
    )
    test = held.select(
        F.col("src").alias("subj"), F.col("rel").alias("pred"),
        F.col("dst").alias("obj"),
    )
    known = target.select(
        F.col("src").alias("subj"), F.col("rel").alias("pred"),
        F.col("dst").alias("obj"),
    )
    save(filtered_ranks(cand, test, known), "eval_ranks")
    save(
        ranking_metrics(
            spark.read.parquet(os.path.join(out, "eval_ranks"))
        ),
        "eval_metrics",
    )

    # ---- negative samples for embedding training ----
    save(
        negative_samples(
            edges_p.select(
                F.col("src").alias("subj"), F.col("rel").alias("pred"),
                F.col("dst").alias("obj"),
            ),
            verts_p.select(F.col("ent").alias("entity")),
            k=args.neg_k,
        ),
        "negatives",
    )

    # ---- TransE embedding training over the KG: deterministic hash
    # init, full-batch fixed-point subgradient steps (bit-stable
    # across engines/cluster sizes/retries), one parquet round trip
    # per step so the lineage never compounds ----
    triples_t = edges_p.select(
        F.col("src").alias("subj"),
        F.concat(F.lit("p:"), F.col("rel")).alias("pred"),
        F.col("dst").alias("obj"),
    )
    pairs = (
        negative_samples(triples_t, verts_p.select(F.col("ent").alias("entity")), k=1)
        .select("subj", "pred", "obj", "neg_obj")
    )
    emb_ids = verts_p.select(F.col("ent").alias("id")).unionAll(
        triples_t.select(F.col("pred").alias("id")).distinct()
    )
    emb = init_embeddings(emb_ids, dim=args.emb_dim, seed=0)
    # ping-pong scratch dirs: the final save's lineage must never
    # read the path it is overwriting
    for k in range(args.emb_steps):
        scratch = os.path.join(out, f"_emb_scratch{k % 2}")
        emb.write.mode("overwrite").parquet(scratch)
        emb = transe_step(
            spark.read.parquet(scratch),
            pairs,
            lr=args.emb_lr,
            margin=args.emb_margin,
        )
    save(emb, "kg_emb")
    save(
        transe_distance(
            spark.read.parquet(os.path.join(out, "kg_emb")), triples_t
        ),
        "triple_energies",
    )

    docs.unpersist()
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
