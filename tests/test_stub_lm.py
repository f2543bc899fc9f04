"""StubMLM determinism + the FIXTURES.md §4 shaping property:
seed-tuple entities score highest for their relation's prompts."""

import numpy as np

from knowledge_harvest_from_lms_spark.functions.scoring import combine_mask_logprobs
from knowledge_harvest_from_lms_spark.lm.stub import build_stub_lm
from knowledge_harvest_from_lms_spark.sources.fixtures import FIXTURE_RELATIONS


def _score(lm, prompt, tup):
    lps = lm.pll_mask_logprobs(prompt, tup)
    return combine_mask_logprobs(lps, n_ents=len(tup))


def test_deterministic_across_instances():
    lm1 = build_stub_lm(seed=42)
    lm2 = build_stub_lm(seed=42)
    t = "<mask> can fly in <mask> ."
    np.testing.assert_array_equal(lm1.mask_logits(t), lm2.mask_logits(t))
    p = "<ENT0> can <ENT1> in <ENT2> ."
    assert lm1.pll_mask_logprobs(p, ["bird", "fly", "sky"]) == lm2.pll_mask_logprobs(
        p, ["bird", "fly", "sky"]
    )


def test_seed_entities_beat_negatives():
    lm = build_stub_lm(seed=42)
    rel = next(r for r in FIXTURE_RELATIONS if r["rel"] == "AtLocation")
    prompt = rel["init_prompts"][0]
    seeds = [[e.replace("_", " ") for e in t] for t in rel["seed_ent_tuples"]]
    wins = 0
    trials = 0
    for t in seeds:
        pos = _score(lm, prompt, t)
        for t1 in seeds:
            if t1[1] == t[1]:
                continue
            neg = _score(lm, prompt, [t[0], t1[1]])
            trials += 1
            if pos > neg:
                wins += 1
    # shaped stub: positives beat slot-swapped negatives most of the time
    assert wins / trials > 0.7, (wins, trials)


def test_banned_ids_cover_stopwords_and_specials():
    lm = build_stub_lm()
    banned = set(lm.banned_ids.tolist())
    assert {0, 1, 2, 3} <= banned  # specials
    for w in ["the", "is", "can", "in"]:
        i = lm.encode_word(w)
        if lm.token_text(i) == w:
            assert i in banned


def test_mask_logits_shape():
    lm = build_stub_lm()
    out = lm.mask_logits("<mask> is the location for <mask> <mask> .")
    assert out.shape == (3, lm.vocab_size)


def test_allowed_token_mask():
    lm = build_stub_lm()
    mask = lm.allowed_token_mask()
    assert mask.shape == (lm.vocab_size,)
    # specials like <mask> contain punctuation -> disallowed
    assert not mask[0]
    assert mask.sum() > 10
