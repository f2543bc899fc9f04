"""Executed coverage for the HF backend's parity-critical logic
(VERDICT r1 item 9): the PLL row plan (mask-position location), the
left-to-right re-masking, the token-budget packing, and the agreement
between the per-pair and packed-batch scoring paths — all exercised
WITHOUT torch via a fake word-level tokenizer and a deterministic
numpy forward that depends only on the (unpadded) input ids.

The real ``HFMaskedLM`` routes both ``pll_mask_logprobs`` and
``pll_mask_logprobs_batch`` through the same ``_forward_logprob_rows``
hook, so these tests exercise the exact code paths production runs —
only the model forward is substituted.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from knowledge_harvest_from_lms_spark.lm.hf import (
    HFMaskedLM,
    pack_by_token_budget,
    pll_row_plan,
    remasked_rows,
)
from knowledge_harvest_from_lms_spark.lm.stub import build_stub_lm

V = 4096
PAD, MASK_ID, BOS, EOS = 0, 1, 2, 3


class FakeTokenizer:
    """Word-level tokenizer with the minimal HF surface the backend
    uses: encode/decode, mask/pad token ids, vocab_size."""

    mask_token = "<mask>"
    mask_token_id = MASK_ID
    pad_token_id = PAD
    vocab_size = V

    def __init__(self):
        self._rev = {MASK_ID: self.mask_token, PAD: "<pad>", BOS: "<s>", EOS: "</s>"}

    def _wid(self, w: str) -> int:
        if w == self.mask_token:
            return MASK_ID
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        wid = 4 + h % (V - 4)
        self._rev[wid] = w
        return wid

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids = [self._wid(w) for w in text.split()]
        return [BOS] + ids + [EOS] if add_special_tokens else ids

    def decode(self, ids) -> str:
        if isinstance(ids, int):
            ids = [ids]
        return " ".join(self._rev.get(int(i), "<unk>") for i in ids)


class FakeHF(HFMaskedLM):
    """HFMaskedLM with the torch forward replaced by a deterministic
    numpy function of the UNPADDED row ids — so batch/loop agreement
    fails if packing or padding leaks into the scores."""

    def __init__(self):  # no torch, no model download
        self._tok = FakeTokenizer()
        self.mask_token = self._tok.mask_token

    def _forward_logits_padded(self, ids_list):
        maxlen = max(len(ids) for ids in ids_list)
        out = np.zeros((len(ids_list), maxlen, V))
        for j, ids in enumerate(ids_list):
            key = ",".join(map(str, ids))
            for pos in range(len(ids)):
                seed = int.from_bytes(
                    hashlib.blake2b(f"{key}|{pos}".encode(), digest_size=8).digest(),
                    "big",
                ) & 0x7FFFFFFFFFFFFFFF
                rng = np.random.Generator(np.random.PCG64(seed))
                out[j, pos] = rng.standard_normal(V)
        return out


PAIRS = [
    ("<ENT0> is located in <ENT1> .", ["paris", "france"]),
    ("the capital of <ENT1> is <ENT0> .", ["tokyo", "japan"]),
    ("<ENT0> can be used for <ENT1> .", ["knife", "cutting bread"]),
    ("people go to <ENT0> to <ENT1> .", ["library", "read"]),
]


def test_row_plan_positions_hand_checked():
    tok = FakeTokenizer()
    ids, pos = pll_row_plan(tok, "<ENT0> is located in <ENT1> .", ["paris", "france"])
    # sent = "Paris is located in france ." (ENT0 starts the prompt →
    # capitalized, language_model_wrapper.py:41-43); word-level ids =
    # [BOS, Paris, is, located, in, france, ., EOS]
    assert len(ids) == 8 and ids[0] == BOS and ids[-1] == EOS
    assert pos == [1, 5]
    assert tok.decode([ids[1]]) == "Paris" and tok.decode([ids[5]]) == "france"


def test_row_plan_first_word_only():
    tok = FakeTokenizer()
    ids, pos = pll_row_plan(
        tok, "<ENT0> can be used for <ENT1> .", ["knife", "cutting bread"]
    )
    # only "cutting" (first word of ENT1) is scored — one position per
    # entity at word level (language_model_wrapper.py:104-109)
    assert len(pos) == 2
    assert tok.decode([ids[pos[1]]]) == "cutting"


def test_remasked_rows_left_to_right():
    ids = [BOS, 10, 11, 12, 13, EOS]
    rows = remasked_rows(ids, [2, 4], MASK_ID)
    assert len(rows) == 2
    r0_ids, r0_pos, r0_label = rows[0]
    assert r0_pos == 2 and r0_label == 11
    assert r0_ids[2] == MASK_ID and r0_ids[4] == MASK_ID  # masks i..end
    r1_ids, r1_pos, r1_label = rows[1]
    assert r1_pos == 4 and r1_label == 13
    assert r1_ids[2] == 11 and r1_ids[4] == MASK_ID  # earlier pos restored


def test_pack_by_token_budget():
    items = [[0] * n for n in (5, 5, 5, 9, 2, 10)]
    chunks = pack_by_token_budget(items, len, max_tokens=10)
    assert [len(c) for c in chunks] == [2, 1, 1, 1, 1]
    assert sum(len(c) for c in chunks) == len(items)
    for c in chunks[:-1]:
        assert sum(len(i) for i in c) <= 10
    # oversized single item still ships alone
    assert pack_by_token_budget([[0] * 99], len, 10) == [[[0] * 99]]


def test_pll_batch_equals_loop():
    lm = FakeHF()
    loop = [lm.pll_mask_logprobs(p, e) for p, e in PAIRS]
    for budget in (8, 64, 10_000):  # many chunks → one chunk
        batch = lm.pll_mask_logprobs_batch(PAIRS, max_tokens_per_forward=budget)
        assert len(batch) == len(loop)
        for a, b in zip(loop, batch):
            np.testing.assert_allclose(a, b, rtol=1e-12)


def test_mask_logits_batch_equals_single():
    lm = FakeHF()
    texts = [
        "<mask> is located in france .",
        "the capital of japan is <mask> .",
        "<mask> can be used for <mask> <mask> .",
    ]
    singles = [lm.mask_logits(t) for t in texts]
    for budget in (8, 10_000):
        batch = lm.mask_logits_batch(texts, max_tokens_per_forward=budget)
        for s, b in zip(singles, batch):
            assert s.shape == b.shape  # [n_masks, V]
            np.testing.assert_allclose(s, b, rtol=1e-12)
    assert singles[2].shape[0] == 3


def test_stub_mask_logits_batch_contract():
    lm = build_stub_lm()
    texts = ["<mask> is the location for reading .", "people go to <mask> <mask> ."]
    batch = lm.mask_logits_batch(texts)
    for t, b in zip(texts, batch):
        np.testing.assert_array_equal(lm.mask_logits(t), b)


def test_hf_unavailable_without_torch():
    with pytest.raises(NotImplementedError):
        HFMaskedLM("roberta-large")
