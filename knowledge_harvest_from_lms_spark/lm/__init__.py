from __future__ import annotations

import numpy as np

from .base import MaskedLM
from .stub import StubMLM, build_stub_lm, get_cached_stub_lm

__all__ = [
    "MaskedLM", "StubMLM", "build_stub_lm", "get_cached_stub_lm",
    "resolve_lm", "token_mask_payload", "unpack_token_masks",
]


def resolve_lm(name: str, seed: int = 42) -> MaskedLM:
    """Per-executor LM resolution: 'stub' → deterministic word-level
    StubMLM singleton; 'fake' → deterministic sentencepiece-style
    SUBWORD backend riding the real HFMaskedLM code paths (lm/fake.py,
    torch-less); 'fake-bpe' / 'fake-wp' → byte-BPE (GPT-2/roberta
    structure) / WordPiece (BERT structure) fakes over the same real
    paths (lm/fake_tokenizers.py); anything else → HuggingFace model
    name (import-gated)."""
    if name == "stub":
        return get_cached_stub_lm(seed=seed)
    if name == "fake":
        from .fake import get_cached_fake_lm

        return get_cached_fake_lm(seed=seed)
    if name == "fake-bpe":
        from .fake_tokenizers import get_cached_bpe_lm

        return get_cached_bpe_lm(seed=seed)
    if name == "fake-wp":
        from .fake_tokenizers import get_cached_wp_lm

        return get_cached_wp_lm(seed=seed)
    if name.startswith("numpy:"):
        from .numpy_lm import get_cached_numpy_lm

        return get_cached_numpy_lm(name[len("numpy:"):])
    from .hf import get_cached_hf_lm

    return get_cached_hf_lm(name)


def token_mask_payload(name: str, seed: int = 42) -> tuple[int, bytes, bytes] | None:
    """Driver-side precompute of the beam's token masks, shipped packed
    in the expansion-UDF closure so no python worker ever re-runs the
    full-vocab decode scan (~250k tokenizer calls on a real MLM,
    VERDICT r1 item 6).

    Returns ``(vocab_size, char_ok_packbits, banned_packbits)``:

    * ``char_ok`` — F9 char filter per token id (alpha + no punct,
      reference ``entity_tuple_searcher.py:212-217``);
    * ``banned`` — special-token + stopword ids (reference
      ``language_model_wrapper.py:23-27``), the only ids masked to
      ``-inf`` BEFORE log-softmax.

    For HF names only the *tokenizer* is loaded on the driver (never
    the model weights). Returns None when the masks can't be built here
    (e.g. no ``transformers`` on the driver) — workers then fall back
    to the memoized per-process scan. Memoized per (name, seed): the
    full-vocab decode scan runs once per driver process, not once per
    search. Masks are sized to cover added special tokens whose ids
    sit at/above ``tok.vocab_size`` (e.g. DeBERTa-v3's [MASK])."""
    key = (name, seed)
    if key in _PAYLOAD_CACHE:
        return _PAYLOAD_CACHE[key]
    try:
        if name in ("stub", "fake", "fake-bpe", "fake-wp"):
            lm = resolve_lm(name, seed)
            char_ok = lm.allowed_token_mask()
            vocab = lm.vocab_size
            banned_ids = np.asarray(lm.banned_ids, dtype=np.int64)
        elif name.startswith("numpy:"):
            # vocab.txt only — never the weights — on the driver
            from .numpy_lm import (
                load_checkpoint_tokenizer,
                tokenizer_token_masks_from_vocab,
            )

            tok = load_checkpoint_tokenizer(name[len("numpy:"):])
            vocab, char_ok, banned_ids = tokenizer_token_masks_from_vocab(tok)
        else:
            from .hf import tokenizer_token_masks

            vocab, char_ok, banned_ids = tokenizer_token_masks(name)
            banned_ids = np.asarray(banned_ids, dtype=np.int64)
        size = int(max(vocab, (banned_ids.max() + 1) if banned_ids.size else 0))
        full_char = np.zeros(size, dtype=bool)
        full_char[: len(char_ok)] = char_ok
        banned = np.zeros(size, dtype=bool)
        banned[banned_ids] = True
        payload = (
            size,
            np.packbits(full_char).tobytes(),
            np.packbits(banned).tobytes(),
        )
    except Exception:
        payload = None
    _PAYLOAD_CACHE[key] = payload
    return payload


_PAYLOAD_CACHE: dict[tuple[str, int], tuple[int, bytes, bytes] | None] = {}


def unpack_token_masks(payload: tuple[int, bytes, bytes]) -> tuple[np.ndarray, np.ndarray]:
    """(char_ok[vocab], banned[vocab]) bool arrays from a packed payload."""
    vocab, char_b, banned_b = payload
    char_ok = np.unpackbits(np.frombuffer(char_b, dtype=np.uint8))[:vocab].astype(bool)
    banned = np.unpackbits(np.frombuffer(banned_b, dtype=np.uint8))[:vocab].astype(bool)
    return char_ok, banned
