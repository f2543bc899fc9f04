"""Parity sweep over the reference's real relation_info inputs
(read-only public data at /root/reference/relation_info): the Spark
prompt-preparation path must match the pure-Python reference semantics
(is_valid_prompt → fix_prompt_style, set-dedup of raw strings) for
EVERY prompt in conceptnet + human, and the harvest must run without
crashing on odd prompt shapes ("<ENT0>ing", punctuation, ternary)."""

import json
import os

import pytest

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.functions.textops import (
    fix_prompt_style,
    get_n_ents,
    is_valid_prompt,
)
from knowledge_harvest_from_lms_spark.plans.harvest import harvest
from knowledge_harvest_from_lms_spark.sources.relations import (
    candidate_prompts,
    relations_from_json,
)

REL_DIR = "/root/reference/relation_info"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REL_DIR), reason="reference relation_info not mounted"
)


@pytest.mark.parametrize("rel_set", ["conceptnet", "human", "lama", "ekar_aggr"])
def test_candidate_prompts_match_reference_semantics(spark, rel_set):
    path = f"{REL_DIR}/{rel_set}.json"
    info = json.load(open(path))
    rels_df = relations_from_json(spark, path)

    got = {}
    for r in candidate_prompts(rels_df, use_init_prompts=False).collect():
        got.setdefault(r.rel, set()).add(r.prompt)

    for rel, v in info.items():
        # reference: set(init+prompts) (main.py:50), validity filter +
        # style fix (knowledge_harvester.py:39-42)
        pool = list(dict.fromkeys(v["init_prompts"] + v.get("prompts", [])))
        expected = {fix_prompt_style(p) for p in pool if is_valid_prompt(p)}
        assert got.get(rel, set()) == expected, rel


@pytest.mark.parametrize("rel_set", ["conceptnet", "human", "lama", "ekar_aggr"])
def test_arity_matches_reference(spark, rel_set):
    path = f"{REL_DIR}/{rel_set}.json"
    info = json.load(open(path))
    rows = {r.rel: r.n_ents for r in relations_from_json(spark, path).collect()}
    for rel, v in info.items():
        assert rows[rel] == get_n_ents(v["init_prompts"][0]), rel


def test_harvest_survives_odd_reference_relations(spark):
    """Three structurally awkward conceptnet relations end-to-end with
    the stub LM (whose vocab doesn't cover them — exercises <unk>
    paths, suffix prompts like '<ENT0>ing', leading-slot capitalize)."""
    path = f"{REL_DIR}/conceptnet.json"
    rels = relations_from_json(spark, path).filter(
        "rel in ('CreatedBy','HasSubevent','MadeOf')"
    )
    cfg = HarvestConfig(
        max_n_ent_tuples=4, token_beam_width=3, max_ent_subwords=1,
        shuffle_partitions=8, prune_slack=2.0,
    )
    out = harvest(spark, rels, cfg)
    triples = out["triples"].collect()
    # deterministic, well-formed output (content quality needs a real
    # LM; the stub guarantees shape + determinism only)
    assert all(len(t.ents) == 2 for t in triples)
    again = harvest(spark, rels, cfg)["triples"].collect()
    assert sorted((r.rel, r.rank, tuple(r.ents)) for r in triples) == sorted(
        (r.rel, r.rank, tuple(r.ents)) for r in again
    )
