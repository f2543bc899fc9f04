"""Full beam search over the SUBWORD fake backend (lm='fake'): the
HFMaskedLM code paths — sentencepiece-style encode/decode,
partial_slot_text's decode+mask shape, packed mask_logits_batch — run
end-to-end through search_ent_tuples, which the word-level stub can't
exercise (one word == one token there)."""

import numpy as np

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.functions.textops import entity_passes_filters
from knowledge_harvest_from_lms_spark.lm import resolve_lm
from knowledge_harvest_from_lms_spark.lm.fake import get_cached_fake_lm
from knowledge_harvest_from_lms_spark.operators.beam_search import (
    finalize_candidates,
    search_ent_tuples,
)
from knowledge_harvest_from_lms_spark.sources.relations import fixture_relations


def _pw(spark):
    return spark.createDataFrame(
        [
            ("AtLocation", "<ENT0> is located in <ENT1> .", 0.6),
            ("AtLocation", "You find <ENT0> in <ENT1> .", 0.4),
        ],
        "rel string, prompt string, weight double",
    )


CFG = HarvestConfig(
    max_n_ent_tuples=8, token_beam_width=6, max_ent_subwords=2,
    shuffle_partitions=8, lm="fake", prune_slack=None,
)


def test_fake_lm_tokenizer_round_trip():
    lm = get_cached_fake_lm()
    ids = lm._tok.encode("a giraffe lives in africa")
    assert ids[0] == 2 and ids[-1] == 3  # bos/eos
    assert lm._tok.decode(ids) == "a giraffe lives in africa"
    # multi-piece word: 'giraffe' (7 chars, piece_len 3) = 3 pieces
    giraffe = lm._tok.encode("giraffe", add_special_tokens=False)
    assert len(giraffe) == 3
    assert lm.decode(giraffe) == "giraffe"
    # partial_slot_text: HF shape = decoded-prefix + concatenated masks
    assert lm.partial_slot_text(giraffe[:1], 2) == "gir<mask><mask>"
    # batched == loop on the inherited packed path
    pairs = [("<ENT0> is located in <ENT1> .", ["giraffe", "africa"])]
    np.testing.assert_allclose(
        lm.pll_mask_logprobs_batch(pairs)[0],
        lm.pll_mask_logprobs(*pairs[0]),
        rtol=1e-12,
    )


def test_fake_lm_resolution_and_determinism():
    a, b = resolve_lm("fake", 42), resolve_lm("fake", 42)
    assert a is b  # per-process singleton
    l1 = a.mask_logits("the <mask> is located in africa .")
    l2 = get_cached_fake_lm(42).mask_logits("the <mask> is located in africa .")
    np.testing.assert_array_equal(l1, l2)


def test_subword_beam_end_to_end(spark):
    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    pw = _pw(spark)
    raw = search_ent_tuples(spark, pw, rels, CFG)
    cand = finalize_candidates(raw, CFG).collect()
    assert cand, "subword beam must complete tuples"
    lm = get_cached_fake_lm()
    multi_piece = 0
    for r in cand:
        assert len(r.ents) == 2
        for e in r.ents:
            assert entity_passes_filters(e), e
            n_pieces = len(lm._tok.encode(e, add_special_tokens=False))
            assert 1 <= n_pieces <= CFG.max_ent_subwords
            multi_piece += n_pieces > 1
    assert multi_piece > 0, "max_ent_subwords=2 must yield multi-token entities"


def test_subword_beam_deterministic_across_partitionings(spark):
    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    pw = _pw(spark)
    a = search_ent_tuples(spark, pw.repartition(1), rels, CFG).collect()
    b = search_ent_tuples(spark, pw.repartition(5), rels, CFG).collect()
    ka = sorted((r.rel, tuple(r.ents), round(r.min_logprob, 9)) for r in a)
    kb = sorted((r.rel, tuple(r.ents), round(r.min_logprob, 9)) for r in b)
    assert ka == kb


def test_fake_full_harvest(spark):
    """Whole pipeline (prompt weighting -> beam -> word cap ->
    rescoring) over the subword backend: PLL row plans, packed
    scoring and casing variants all run through HFMaskedLM code."""
    from knowledge_harvest_from_lms_spark.plans.harvest import harvest

    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    cfg = HarvestConfig(
        max_n_ent_tuples=6, token_beam_width=5, max_ent_subwords=2,
        shuffle_partitions=8, lm="fake",
    )
    out = harvest(spark, rels, cfg)
    pw = out["prompt_weights"].collect()
    assert pw and abs(sum(r.weight for r in pw) - 1.0) < 1e-9
    triples = out["triples"].collect()
    assert triples
    ranks = sorted(r.rank for r in triples)
    assert ranks == list(range(1, len(ranks) + 1))
    w = sum(r.weight for r in triples)
    # A5 softmax over tuple scores; weights publish at round-9
    # (operators/rescoring.py), so the sum carries n * 5e-10 residue
    assert abs(w - 1.0) < 5e-7
