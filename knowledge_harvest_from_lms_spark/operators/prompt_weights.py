"""Prompt-compatibility weighting as a Spark dataflow.

Re-expresses the reference's ``update_prompts``
(reference ``models/knowledge_harvester.py:44-83``):

  J1  positives   = prompts × own seed tuples (broadcast cross join)
  J2  negatives   = slot-substitution theta self-join of the seed table
  P1  scoring     = Arrow mapInPandas (operators/scoring_udf.py)
  A1/A2/A3        = conditional means + compatibility projection
  W1  top-k       = row_number window per relation
  A4  softmax     = window softmax + clip + renorm, floor drop

Reference quirk preserved for parity: negatives compare the RAW
(underscored) donor entity against the normalized target entity and
substitute the RAW string (``models/knowledge_harvester.py:53-64``
iterates ``self._seed_ent_tuples`` — unnormalized — inside the loop
over normalized tuples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..config import HarvestConfig
from ..sources.relations import candidate_prompts
from .scoring_udf import score_distinct_pairs


def seed_tuples(relations: DataFrame) -> DataFrame:
    """(rel, seed_idx, ents_raw, ents) — F3 underscore→space on the
    normalized copy (knowledge_harvester.py:48)."""
    return relations.select(
        "rel",
        "n_ents",
        F.posexplode("seed_ent_tuples").alias("seed_idx", "ents_raw"),
    ).withColumn(
        "ents", F.transform("ents_raw", lambda e: F.regexp_replace(e, "_", " "))
    )


def scoring_pairs(prompts: DataFrame, seeds: DataFrame, max_arity: int) -> DataFrame:
    """Positive + negative (prompt, tuple) pairs, tagged ``kind``."""
    pos = prompts.join(seeds.select("rel", "ents"), "rel").select(
        "rel", "prompt", "ents", F.lit("pos").alias("kind")
    )

    negs = []
    a = seeds.select("rel", "n_ents", F.col("ents").alias("a_ents"))
    b = seeds.select(F.col("rel").alias("rel_b"), F.col("ents_raw").alias("b_raw"))
    for i in range(max_arity):
        cand = (
            a.filter(F.col("n_ents") > i)
            .join(b, F.col("rel") == F.col("rel_b"))
            .filter(F.col("b_raw")[i] != F.col("a_ents")[i])
        )
        neg_ents = F.concat(
            F.slice("a_ents", 1, i),
            F.array(F.col("b_raw")[i]),
            F.when(
                F.col("n_ents") > i + 1,
                F.slice("a_ents", i + 2, max_arity),
            ).otherwise(F.array().cast("array<string>")),
        )
        negs.append(cand.select("rel", neg_ents.alias("ents")))
    neg_tuples = negs[0]
    for n in negs[1:]:
        neg_tuples = neg_tuples.union(n)
    neg = prompts.join(neg_tuples, "rel").select(
        "rel", "prompt", "ents", F.lit("neg").alias("kind")
    )
    return pos.union(neg)


def compute_prompt_weights(
    relations: DataFrame, cfg: HarvestConfig
) -> DataFrame:
    """→ (rel, prompt, weight) with weight > weight_floor, softmax-
    normalized per relation."""
    prompts = candidate_prompts(relations, cfg.use_init_prompts).select("rel", "prompt")
    seeds = seed_tuples(relations)
    max_arity = relations.agg(F.max("n_ents")).collect()[0][0]
    if max_arity is None:  # no relations → empty weights
        return relations.sparkSession.createDataFrame(
            [], "rel string, prompt string, weight double"
        )

    pairs = scoring_pairs(F.broadcast(prompts), F.broadcast(seeds), max_arity)
    scored = score_distinct_pairs(pairs, cfg.lm, cfg.seed)

    compat = (
        scored.groupBy("rel", "prompt")
        .agg(
            F.avg(F.when(F.col("kind") == "pos", F.col("score"))).alias("pos_mean"),
            F.avg(F.when(F.col("kind") == "neg", F.col("score"))).alias("neg_mean"),
        )
        .withColumn(
            "raw_score",
            (F.col("pos_mean") - 0.5 * F.col("neg_mean")) / F.lit(cfg.prompt_temp),
        )
    )

    topk = W.partitionBy("rel").orderBy(F.desc("raw_score"), F.asc("prompt"))
    kept = compat.withColumn("rn", F.row_number().over(topk)).filter(
        F.col("rn") <= cfg.max_n_prompts
    )

    part = W.partitionBy("rel")
    e = F.exp(F.col("raw_score") - F.max("raw_score").over(part))
    kept = kept.withColumn("p", e / F.sum(e).over(part))
    kept = kept.withColumn(
        "pc", F.when(F.col("p") < cfg.weight_clip, F.lit(0.0)).otherwise(F.col("p"))
    )
    kept = kept.withColumn("weight", F.col("pc") / F.sum("pc").over(part))
    return kept.filter(F.col("weight") > cfg.weight_floor).select(
        "rel", "prompt", "weight"
    )
