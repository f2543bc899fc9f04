"""Spark pipeline vs sequential spec: the distributed implementation
must reproduce the deterministic spec exactly (top-k P/R = 1.0,
scores within fp tolerance), plus determinism across partitionings."""

import pytest

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.lm import build_stub_lm
from knowledge_harvest_from_lms_spark.plans.harvest import harvest
from knowledge_harvest_from_lms_spark.sources.fixtures import FIXTURE_RELATIONS
from knowledge_harvest_from_lms_spark.sources.relations import relations_from_records

import seq_spec


CFG = HarvestConfig(
    max_n_ent_tuples=20, token_beam_width=8, max_ent_subwords=2,
    shuffle_partitions=8,
)
BINARY = [r for r in FIXTURE_RELATIONS if r["rel"] in ("AtLocation", "CapableOf")]


@pytest.fixture(scope="module")
def spark_out(spark):
    rels = relations_from_records(spark, BINARY)
    out = harvest(spark, rels, CFG)
    return {
        "pw": out["prompt_weights"].collect(),
        "cand": out["candidates"].collect(),
        "triples": out["triples"].collect(),
    }


@pytest.fixture(scope="module")
def spec_out():
    lm = build_stub_lm(seed=CFG.seed)
    pw = seq_spec.spec_prompt_weights(BINARY, lm, CFG)
    cands = seq_spec.spec_search(BINARY, pw, lm, CFG)
    fin = seq_spec.spec_finalize(cands, CFG)
    triples = seq_spec.spec_rescore(fin, pw, lm, CFG)
    return {"pw": pw, "fin": fin, "triples": triples}


def test_prompt_weights_match_spec(spark_out, spec_out):
    got = {}
    for r in spark_out["pw"]:
        got.setdefault(r.rel, {})[r.prompt] = r.weight
    for rel, expected in spec_out["pw"].items():
        exp = dict(expected)
        assert set(got[rel]) == set(exp), rel
        for p, w in exp.items():
            assert got[rel][p] == pytest.approx(w, rel=1e-9), (rel, p)


def test_candidates_match_spec(spark_out, spec_out):
    got = {}
    for r in spark_out["cand"]:
        got.setdefault(r.rel, set()).add(tuple(r.ents))
    for rel, expected in spec_out["fin"].items():
        exp = {tuple(e) for e, _ in expected}
        assert got.get(rel, set()) == exp, rel


def test_triples_match_spec(spark_out, spec_out):
    got = {}
    for r in spark_out["triples"]:
        got.setdefault(r.rel, []).append((r.rank, tuple(r.ents), r.score, r.weight))
    for rel, expected in spec_out["triples"].items():
        rows = sorted(got[rel])
        assert len(rows) == len(expected), rel
        for (rank, ents, score, weight), (e_ents, e_score, e_weight, e_rank) in zip(
            rows, expected
        ):
            assert rank == e_rank and ents == tuple(e_ents), (rel, rank)
            assert score == pytest.approx(e_score, rel=1e-6)
            assert weight == pytest.approx(e_weight, rel=1e-6)


def test_ternary_relation_runs(spark):
    ternary = [r for r in FIXTURE_RELATIONS if r["rel"] == "somebody_do_something_at"]
    cfg = HarvestConfig(
        max_n_ent_tuples=6, token_beam_width=4, max_ent_subwords=1,
        shuffle_partitions=8,
    )
    rels = relations_from_records(spark, ternary)
    out = harvest(spark, rels, cfg)
    triples = out["triples"].collect()
    assert all(len(t.ents) == 3 for t in triples)

    lm = build_stub_lm(seed=cfg.seed)
    pw = seq_spec.spec_prompt_weights(ternary, lm, cfg)
    fin = seq_spec.spec_finalize(seq_spec.spec_search(ternary, pw, lm, cfg), cfg)
    exp = {tuple(e) for e, _ in fin["somebody_do_something_at"]}
    got = {tuple(t.ents) for t in triples}
    assert got == exp


def test_determinism_across_partitionings(spark):
    rels = relations_from_records(spark, BINARY[:1])
    cfg1 = HarvestConfig(max_n_ent_tuples=10, token_beam_width=6,
                         max_ent_subwords=1, shuffle_partitions=3)
    cfg2 = HarvestConfig(max_n_ent_tuples=10, token_beam_width=6,
                         max_ent_subwords=1, shuffle_partitions=17)
    t1 = harvest(spark, rels, cfg1)["triples"].collect()
    t2 = harvest(spark, rels, cfg2)["triples"].collect()
    k1 = sorted((r.rel, r.rank, tuple(r.ents), round(r.weight, 10)) for r in t1)
    k2 = sorted((r.rel, r.rank, tuple(r.ents), round(r.weight, 10)) for r in t2)
    assert k1 == k2
