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


def test_token_mask_payload_round_trip():
    import numpy as np

    from knowledge_harvest_from_lms_spark.lm import (
        build_stub_lm,
        token_mask_payload,
        unpack_token_masks,
    )

    payload = token_mask_payload("stub")
    assert payload is not None
    char_ok, banned = unpack_token_masks(payload)
    lm = build_stub_lm()
    assert payload[0] == lm.vocab_size
    np.testing.assert_array_equal(char_ok, lm.allowed_token_mask())
    expect_banned = np.zeros(lm.vocab_size, dtype=bool)
    expect_banned[lm.banned_ids] = True
    np.testing.assert_array_equal(banned, expect_banned)


def test_expand_fn_payload_equals_fallback():
    """make_expand_fn must produce identical children whether the token
    masks come packed in the closure (driver precompute) or from the
    worker-side memoized scan (fallback)."""
    import pandas as pd

    from knowledge_harvest_from_lms_spark.lm import token_mask_payload
    from knowledge_harvest_from_lms_spark.operators.beam_search import make_expand_fn

    rel_info = {
        "AtLocation": {
            "prompts": [("<ENT0> is located in <ENT1> .", 0.6),
                        ("You find <ENT0> in <ENT1> .", 0.4)],
            "n_ents": 2,
        }
    }
    pdf = pd.DataFrame(
        {
            "rel": ["AtLocation"],
            "t": [0],
            "n_masks": [[1, 1]],
            "ent_idx": [0],
            "ents": [[]],
            "ent_logprobs": [[]],
            "token_ids": [[]],
            "token_logprobs": [[]],
        }
    )
    with_payload = make_expand_fn(
        "stub", 42, rel_info, width=6, mask_payload=token_mask_payload("stub")
    )
    fallback = make_expand_fn("stub", 42, rel_info, width=6, mask_payload=None)
    a = pd.concat(list(with_payload([pdf.copy()])), ignore_index=True)
    b = pd.concat(list(fallback([pdf.copy()])), ignore_index=True)
    # width 6 minus completions rejected by the F4-F8 entity filters
    assert 1 <= len(a) <= 6
    pd.testing.assert_frame_equal(a, b)
