"""Content-level parity vs the reference's PUBLISHED golden outputs —
the north rule's P/R >= 0.95 bar — gated on torch/transformers being
installed (they are not in this sandbox, so these tests SKIP here and
run wherever the executor image carries torch; VERDICT r2 item 10).

When they run: harvest one conceptnet relation with
distilbert-base-cased through the full pipeline and compare the ranked
tuples against
/root/reference/results/conceptnet/1000tuples_top20prompts/
distilbert-base-cased/<rel>/ent_tuples.json with
plans/evaluation.precision_recall_at_k. Machinery-level parity (the
same comparison fed by the artifacts themselves) is already proven
torch-free in tests/test_results_json.py.
"""

import os

import pytest

from knowledge_harvest_from_lms_spark.lm.hf import HAS_TORCH

GOLDEN_DIR = (
    "/root/reference/results/conceptnet/1000tuples_top20prompts/"
    "distilbert-base-cased"
)

pytestmark = [
    pytest.mark.skipif(not HAS_TORCH, reason="torch/transformers not installed"),
    pytest.mark.skipif(
        not os.path.isdir(GOLDEN_DIR), reason="reference goldens not mounted"
    ),
]


@pytest.mark.slow
def test_distilbert_content_parity_one_relation(spark):
    from knowledge_harvest_from_lms_spark.config import HarvestConfig
    from knowledge_harvest_from_lms_spark.plans.evaluation import (
        load_golden_ent_tuples,
        precision_recall_at_k,
    )
    from knowledge_harvest_from_lms_spark.plans.harvest import harvest
    from knowledge_harvest_from_lms_spark.sources.relations import relations_from_json

    rel = "AtLocation"
    rels = relations_from_json(
        spark, "/root/reference/relation_info/conceptnet.json"
    ).filter(f"rel = '{rel}'")
    cfg = HarvestConfig(
        max_n_ent_tuples=100, token_beam_width=16, max_ent_subwords=2,
        lm="distilbert-base-cased", shuffle_partitions=8, prune_slack=3.0,
    )
    triples = harvest(spark, rels, cfg)["triples"]
    golden = load_golden_ent_tuples(spark, GOLDEN_DIR, [rel])
    pr = precision_recall_at_k(triples, golden, k=100).collect()[0]
    # record for README regardless; the bar is the north rule's 0.95
    print(f"content parity {rel}: P={pr.precision} R={pr.recall}")
    assert pr.precision >= 0.95 and pr.recall >= 0.95
