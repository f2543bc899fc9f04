"""End-to-end harvest pipeline orchestration (reference ``main.py:8-61``
re-expressed as Spark stages; SURVEY.md §3.1 lifecycle).

    relations ─→ prompt weights ─→ beam search ─→ word-cap/top-n
              └────────────────────────┬──────────────┘
                                  re-score + rank ─→ triples

Each stage returns a DataFrame; writers (Iceberg/parquet, partitioned
by rel) live in operators/checkpoint.py so stages stay pure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import HarvestConfig
from ..operators.beam_search import finalize_candidates, search_ent_tuples
from ..operators.prompt_weights import compute_prompt_weights
from ..operators.rescoring import rescore_and_rank


def harvest(
    spark: SparkSession, relations: DataFrame, cfg: HarvestConfig | None = None
) -> dict[str, DataFrame]:
    cfg = cfg or HarvestConfig()
    # cfg.shuffle_partitions configures the session's shuffle
    # parallelism for this harvest (AQE coalesces below it at
    # runtime). Every constructor in the repo already set the field;
    # until r3-late nothing READ it (review r3) — the determinism
    # tests that vary it across harvests (test_harvest_pipeline) now
    # genuinely exercise different partitionings. The setting stays on
    # the session afterwards, as spark-submit --conf would.
    spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    pw = compute_prompt_weights(relations, cfg)
    pw.persist()
    raw = search_ent_tuples(spark, pw, relations, cfg)
    cand = finalize_candidates(raw, cfg)
    triples = rescore_and_rank(cand, pw, cfg)
    return {"prompt_weights": pw, "candidates": cand, "triples": triples}
