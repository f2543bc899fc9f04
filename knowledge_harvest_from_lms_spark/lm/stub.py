"""StubMLM — seeded, deterministic masked-LM stand-in (FIXTURES.md §4).

No torch/transformers exist in the sandbox, so scoring/beam logic is
exercised against a word-level toy MLM whose logits are a pure
function of (context text, token id):

    logits(ctx) = alpha * mean_w A[w, :]  +  eps * noise(ctx_hash)

where ``A`` is a co-occurrence affinity matrix built from the "world"
sentences obtained by filling every relation's prompts with its own
seed tuples. Seed-tuple entities therefore score highest for their
relation's prompts (the property FIXTURES.md §4 requires), negatives
score lower, and everything is reproducible across processes and
partitionings (hashes via blake2b, RNG via PCG64 — never Python
``hash``).

Tokenizer: whitespace word-level; one word == one token == one "subword",
so ``max_ent_subwords=2`` searches 1- and 2-word entities.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

import numpy as np

from ..functions.stopwords import STOPWORD_SET
from ..functions.textops import get_n_ents, get_sent
from .base import MaskedLM

MASK = "<mask>"
UNK = "<unk>"
BOS = "<s>"
EOS = "</s>"
SPECIALS = [MASK, UNK, BOS, EOS]

# Filler words so the vocab is not only KB words (beam has to reject them).
FILLER_WORDS = [
    "table", "window", "market", "forest", "river", "engine", "bottle",
    "garden", "mountain", "doctor", "artist", "singer", "painter",
    "kitchen", "library", "airport", "station", "hospital", "museum",
    "guitar", "piano", "violin", "hammer", "ladder", "bridge", "tunnel",
    "planet", "galaxy", "ocean", "island", "desert", "valley", "meadow",
    "wolf", "tiger", "eagle", "salmon", "spider", "rabbit", "horse",
    "run", "jump", "swim", "sing", "dance", "paint", "write", "read",
    "build", "repair", "teach", "learn", "cook", "drive", "climb",
]


def stable_hash64(s: str) -> int:
    """Process-stable 64-bit hash (blake2b), NOT Python hash()."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def _words(text: str) -> list[str]:
    return text.split()


_PUNCT_STRIP = ",.;:!?\"'()"


def _norm_word(w: str) -> str:
    """Canonical word form for vocab lookup: strip adjacent punctuation
    (prompts attach commas/periods to slot words), lowercase."""
    return w.strip(_PUNCT_STRIP).lower()


class StubMLM(MaskedLM):
    def __init__(self, relations: list[dict], seed: int = 42,
                 alpha: float = 8.0, eps: float = 0.05):
        self.mask_token = MASK
        self._alpha = alpha
        self._eps = eps
        self._seed = seed

        # --- world sentences: each relation's prompts filled with its
        # own seed tuples (underscores → spaces, as at
        # reference models/knowledge_harvester.py:48).
        sentences: list[list[str]] = []
        vocab_words: set[str] = set(FILLER_WORDS)
        for rel in relations:
            prompts = list(rel["init_prompts"]) + list(rel.get("prompts", []))
            for tup in rel["seed_ent_tuples"]:
                ents = [e.replace("_", " ") for e in tup]
                for p in prompts:
                    if get_n_ents(p) != len(ents):
                        continue
                    sent = get_sent(p, ents).lower()
                    ws = [w for w in map(_norm_word, _words(sent)) if w]
                    sentences.append(ws)
                    vocab_words.update(ws)

        self._itos: list[str] = SPECIALS + sorted(vocab_words)
        self._stoi: dict[str, int] = {w: i for i, w in enumerate(self._itos)}
        V = len(self._itos)

        # --- affinity matrix from co-occurrence counts.
        C = np.zeros((V, V), dtype=np.float64)
        for ws in sentences:
            ids = [self._stoi[w] for w in ws]
            uniq = sorted(set(ids))
            for a in uniq:
                for b in uniq:
                    if a != b:
                        C[a, b] += 1.0
        self._A = np.log1p(C)

        # --- banned ids: specials + single-token stopwords
        # (reference models/language_model_wrapper.py:23-27).
        banned = list(range(len(SPECIALS)))
        for w, i in self._stoi.items():
            if w.lower().strip() in STOPWORD_SET:
                banned.append(i)
        self._banned = np.array(sorted(set(banned)), dtype=np.int64)

    # ------------------------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return len(self._itos)

    @property
    def banned_ids(self) -> np.ndarray:
        return self._banned

    def encode_word(self, w: str) -> int:
        return self._stoi.get(_norm_word(w), self._stoi[UNK])

    def decode(self, token_ids: Sequence[int]) -> str:
        return " ".join(self._itos[int(t)] for t in token_ids)

    def token_text(self, token_id: int) -> str:
        return self._itos[int(token_id)]

    def partial_slot_text(self, token_ids: Sequence[int], n_remaining: int) -> str:
        parts = [self._itos[int(t)].lower() for t in token_ids] + [MASK] * n_remaining
        return " ".join(parts)

    def masked_run(self, n: int) -> str:
        return " ".join([MASK] * n)

    # ------------------------------------------------------------------
    def _context_logits(self, visible_word_ids: list[int], ctx_key: str) -> np.ndarray:
        V = self.vocab_size
        if visible_word_ids:
            aff = self._A[np.asarray(visible_word_ids, dtype=np.int64)].mean(axis=0)
        else:
            aff = np.zeros(V)
        rng = np.random.Generator(np.random.PCG64(
            (stable_hash64(ctx_key) ^ self._seed) & 0x7FFFFFFFFFFFFFFF))
        return self._alpha * aff + self._eps * rng.standard_normal(V)

    def mask_logits(self, input_text: str) -> np.ndarray:
        """[n_masks, V] — one row per mask word in the text (a mask may
        carry adjacent punctuation, e.g. '<mask>,')."""
        ws = _words(input_text)
        mask_pos = [i for i, w in enumerate(ws) if MASK in w]
        visible = [self._stoi[_norm_word(w)] for i, w in enumerate(ws)
                   if MASK not in w and _norm_word(w) in self._stoi]
        out = np.empty((len(mask_pos), self.vocab_size))
        for r, p in enumerate(mask_pos):
            out[r] = self._context_logits(visible, f"{input_text.lower()}|{p}")
        return out

    # ------------------------------------------------------------------
    def pll_mask_logprobs(self, prompt: str, ent_tuple: Sequence[str]) -> list[float]:
        """Word-level analog of the reference PLL scheme
        (reference ``models/language_model_wrapper.py:37-117``):
        first-word-only mask spans, left-to-right re-masking."""
        ents = list(ent_tuple)
        for i, e in enumerate(ents):
            if prompt.startswith(f"<ENT{i}>"):
                ents[i] = e.capitalize()  # language_model_wrapper.py:41-43
        sent = get_sent(prompt, ents)
        ws = _words(sent.lower())

        # mask position = index of the FIRST word of each entity, located
        # via the word-length of the prefix before the slot
        # (analog of language_model_wrapper.py:86-112).
        mask_positions: list[int] = []
        for i, e in enumerate(ents):
            prefix = prompt[: prompt.find(f"<ENT{i}>")]
            prefix_filled = get_sent(prefix, ents)
            pos = len(_words(prefix_filled.lower()))
            mask_positions.append(pos)
        mask_positions.sort()

        logprobs: list[float] = []
        for i, pos in enumerate(mask_positions):
            masked = list(ws)
            for p in mask_positions[i:]:
                masked[p] = MASK
            text = " ".join(masked)
            visible = [self._stoi[_norm_word(w)] for w in masked
                       if MASK not in w and _norm_word(w) in self._stoi]
            logits = self._context_logits(visible, f"{text}|{pos}")
            lse = logits - (np.max(logits) + np.log(np.exp(logits - np.max(logits)).sum()))
            logprobs.append(float(lse[self.encode_word(ws[pos])]))
        return logprobs


def build_stub_lm(relations: list[dict] | None = None, seed: int = 42) -> StubMLM:
    if relations is None:
        from ..sources.fixtures import FIXTURE_RELATIONS
        relations = FIXTURE_RELATIONS
    return StubMLM(relations, seed=seed)


# Per-executor singleton cache (SURVEY.md §2.1 S8): one model per python
# worker process, keyed by config, reused across Arrow batches.
_LM_CACHE: dict[tuple, StubMLM] = {}


def get_cached_stub_lm(fixture_key: str = "default", seed: int = 42) -> StubMLM:
    key = (fixture_key, seed)
    if key not in _LM_CACHE:
        _LM_CACHE[key] = build_stub_lm(seed=seed)
    return _LM_CACHE[key]
