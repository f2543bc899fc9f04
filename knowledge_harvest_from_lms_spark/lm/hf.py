"""Import-gated HuggingFace masked-LM backend.

Semantics mirror the reference wrapper (reference
``models/language_model_wrapper.py:10-126``): AutoModelForMaskedLM +
tokenizer, banned-id vocabulary scan, mask-logit extraction, and the
first-word-only / left-to-right-re-masking PLL. The sandbox has no
torch/transformers, so this module raises a clear error unless those
packages are present on the cluster (shipped via ``--py-files`` +
executor images in production).

On executors, use ``get_cached_hf_lm(model_name)`` inside mapInPandas —
one model per python worker process, lazily constructed, CPU-thread
pinned so local[8] → local[32] scaling measures parallelism rather than
thread thrash (SURVEY.md §7).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ..functions.stopwords import STOPWORD_SET
from ..functions.textops import find_sublist, get_sent
from .base import MaskedLM

try:  # pragma: no cover - not installed in sandbox
    import torch
    from transformers import AutoModelForMaskedLM, AutoTokenizer

    HAS_TORCH = True
except Exception:  # ModuleNotFoundError in sandbox
    HAS_TORCH = False


class HFMaskedLM(MaskedLM):  # pragma: no cover - needs torch
    def __init__(self, model_name: str, device: str = "cpu", num_threads: int = 1):
        if not HAS_TORCH:
            raise NotImplementedError(
                "torch/transformers not available in this environment; "
                "use lm.stub.StubMLM (deterministic stand-in) instead"
            )
        torch.set_num_threads(num_threads)
        self._tok = AutoTokenizer.from_pretrained(model_name)
        self._model = AutoModelForMaskedLM.from_pretrained(model_name)
        self._model.eval()
        self._device = device
        self._model.to(device)
        self.mask_token = self._tok.mask_token

        banned = list(self._tok.all_special_ids)
        for idx in range(self._tok.vocab_size):
            if self._tok.decode(idx).lower().strip() in STOPWORD_SET:
                banned.append(idx)
        self._banned = np.array(sorted(set(banned)), dtype=np.int64)

    @property
    def vocab_size(self) -> int:
        return self._tok.vocab_size

    @property
    def banned_ids(self) -> np.ndarray:
        return self._banned

    def decode(self, token_ids: Sequence[int]) -> str:
        return self._tok.decode(list(token_ids))

    def token_text(self, token_id: int) -> str:
        return self._tok.decode(int(token_id))

    def partial_slot_text(self, token_ids, n_remaining: int) -> str:
        # reference models/entity_tuple_searcher.py:176-181
        return self._tok.decode(list(token_ids)).lower() + self._tok.mask_token * n_remaining

    def masked_run(self, n: int) -> str:
        return self._tok.mask_token * n

    def mask_logits(self, input_text: str) -> np.ndarray:
        with torch.no_grad():
            inputs = self._tok(input_text, return_tensors="pt").to(self._device)
            out = self._model(**inputs)
        sel = inputs["input_ids"] == self._tok.mask_token_id
        return out.logits[sel].cpu().numpy()

    def pll_mask_logprobs(self, prompt: str, ent_tuple: Sequence[str]) -> list[float]:
        # First-word-only mask spans + left-to-right re-masking
        # (reference models/language_model_wrapper.py:37-117).
        import string

        ents = list(ent_tuple)
        for i, e in enumerate(ents):
            if prompt.startswith(f"<ENT{i}>"):
                ents[i] = e.capitalize()
        sent = get_sent(prompt, ents)
        input_ids = self._tok.encode(sent)

        mask_positions: list[int] = []
        for ent_idx, ent in enumerate(ents):
            prefix = prompt[: prompt.find(f"<ENT{ent_idx}>")].strip()
            for i in range(len(ents)):
                prefix = prefix.replace(f"<ENT{i}>", ents[i])
            prefix_ids = self._tok.encode(prefix, add_special_tokens=False)

            ent_in_sent = prompt[prompt.find(f"<ENT{ent_idx}>"):].split()[0]
            for punc in string.punctuation:
                if punc not in "<>":
                    ent_in_sent = ent_in_sent.split(punc)[0]
            ent_in_sent = ent_in_sent.replace(f"<ENT{ent_idx}>", ent)
            ent_in_sent = ent_in_sent.split()[0]  # first word only

            prefixed = f" {ent_in_sent}" if sent[len(prefix)] == " " else ent_in_sent
            ent_token_ids = self._tok.encode(prefixed, add_special_tokens=False)
            if prefix_ids:
                l = find_sublist(input_ids, prefix_ids) + len(prefix_ids)
            else:
                l = find_sublist(input_ids, ent_token_ids)
            mask_positions.extend(range(l, l + len(ent_token_ids)))

        batch = self._tok([sent] * len(mask_positions), return_tensors="pt")
        labels = []
        for i, pos in enumerate(mask_positions):
            labels.append(batch["input_ids"][i][pos].item())
            batch["input_ids"][i][mask_positions[i:]] = self._tok.mask_token_id
        with torch.no_grad():
            logits = self._model(**{k: v.to(self._device) for k, v in batch.items()}).logits
            logprobs = torch.log_softmax(logits, dim=-1)
        rows = torch.arange(len(mask_positions))
        return logprobs[rows, mask_positions, labels].cpu().tolist()


    # -- batched scoring (the 100TB hot path) ---------------------------

    def _pll_rows(self, prompt: str, ent_tuple: Sequence[str]):
        """(input_ids, mask_positions) for one pair — the per-pair part
        of pll_mask_logprobs, without the forward."""
        import string

        ents = list(ent_tuple)
        for i, e in enumerate(ents):
            if prompt.startswith(f"<ENT{i}>"):
                ents[i] = e.capitalize()
        sent = get_sent(prompt, ents)
        input_ids = self._tok.encode(sent)
        mask_positions: list[int] = []
        for ent_idx, ent in enumerate(ents):
            prefix = prompt[: prompt.find(f"<ENT{ent_idx}>")].strip()
            for i in range(len(ents)):
                prefix = prefix.replace(f"<ENT{i}>", ents[i])
            prefix_ids = self._tok.encode(prefix, add_special_tokens=False)
            ent_in_sent = prompt[prompt.find(f"<ENT{ent_idx}>"):].split()[0]
            for punc in string.punctuation:
                if punc not in "<>":
                    ent_in_sent = ent_in_sent.split(punc)[0]
            ent_in_sent = ent_in_sent.replace(f"<ENT{ent_idx}>", ent)
            ent_in_sent = ent_in_sent.split()[0]
            prefixed = f" {ent_in_sent}" if sent[len(prefix)] == " " else ent_in_sent
            ent_token_ids = self._tok.encode(prefixed, add_special_tokens=False)
            if prefix_ids:
                l = find_sublist(input_ids, prefix_ids) + len(prefix_ids)
            else:
                l = find_sublist(input_ids, ent_token_ids)
            mask_positions.extend(range(l, l + len(ent_token_ids)))
        return input_ids, mask_positions

    def pll_mask_logprobs_batch(
        self, pairs: Sequence[tuple[str, Sequence[str]]],
        max_tokens_per_forward: int = 16384,
    ) -> list[list[float]]:
        """Pack the left-to-right re-masked rows of MANY pairs into
        padded forwards bounded by a token budget (the reference runs
        one forward per pair, language_model_wrapper.py:52-62; packing
        across pairs is the 10-100x lever on executors)."""
        rows = []  # (pair_idx, row_in_pair, ids(list), pos, label)
        per_pair_counts = []
        for pi, (prompt, ents) in enumerate(pairs):
            input_ids, mask_positions = self._pll_rows(prompt, ents)
            per_pair_counts.append(len(mask_positions))
            for i, pos in enumerate(mask_positions):
                ids = list(input_ids)
                label = ids[pos]
                for p in mask_positions[i:]:
                    ids[p] = self._tok.mask_token_id
                rows.append((pi, i, ids, pos, label))

        results: dict[tuple[int, int], float] = {}
        chunk: list[tuple] = []
        budget = 0

        def flush(chunk):
            if not chunk:
                return
            maxlen = max(len(r[2]) for r in chunk)
            pad = self._tok.pad_token_id or 0
            input_ids = torch.full((len(chunk), maxlen), pad, dtype=torch.long)
            attn = torch.zeros((len(chunk), maxlen), dtype=torch.long)
            for j, (_, _, ids, _, _) in enumerate(chunk):
                input_ids[j, : len(ids)] = torch.tensor(ids)
                attn[j, : len(ids)] = 1
            with torch.no_grad():
                logits = self._model(
                    input_ids=input_ids.to(self._device),
                    attention_mask=attn.to(self._device),
                ).logits
                logprobs = torch.log_softmax(logits, dim=-1)
            for j, (pi, ri, _, pos, label) in enumerate(chunk):
                results[(pi, ri)] = float(logprobs[j, pos, label])

        for r in rows:
            if chunk and budget + len(r[2]) > max_tokens_per_forward:
                flush(chunk)
                chunk, budget = [], 0
            chunk.append(r)
            budget += len(r[2])
        flush(chunk)

        return [
            [results[(pi, ri)] for ri in range(n)]
            for pi, n in enumerate(per_pair_counts)
        ]


_HF_CACHE: dict = {}


def get_cached_hf_lm(model_name: str, num_threads: int = 1) -> "HFMaskedLM":  # pragma: no cover
    if model_name not in _HF_CACHE:
        _HF_CACHE[model_name] = HFMaskedLM(model_name, num_threads=num_threads)
    return _HF_CACHE[model_name]
