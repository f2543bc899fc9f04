"""Import-gated HuggingFace masked-LM backend.

Semantics mirror the reference wrapper (reference
``models/language_model_wrapper.py:10-126``): AutoModelForMaskedLM +
tokenizer, banned-id vocabulary scan, mask-logit extraction, and the
first-word-only / left-to-right-re-masking PLL. The sandbox has no
torch/transformers, so the *forward* methods raise a clear error
unless those packages are present (shipped via ``--py-files`` +
executor images in production).

Testability without torch: everything parity-critical that is NOT a
model forward — the PLL row plan (mask-position location), the
left-to-right re-masking row construction, and the token-budget
packing — lives in module-level pure functions over a tokenizer-like
object. Both the per-pair path (``pll_mask_logprobs``) and the packed
batch path (``pll_mask_logprobs_batch``) consume the SAME rows through
one overridable hook (``_forward_logprob_rows``), so their agreement
is structural and is exercised in tests with a fake word-level
tokenizer + numpy forward (tests/test_hf_batching.py).

On executors, use ``get_cached_hf_lm(model_name)`` inside mapInPandas —
one model per python worker process, lazily constructed, CPU-thread
pinned so local[4] → local[16] scaling measures parallelism rather
than thread thrash (SURVEY.md §7).
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


# ---------------------------------------------------------------------------
# pure row-plan / packing kernels (no torch; tokenizer-like duck type
# needs only .encode(text, add_special_tokens=...))
# ---------------------------------------------------------------------------

class PLLAlignmentError(ValueError):
    """The encoded prompt prefix / entity tokens could not be aligned
    inside ``encode(sent)`` — a tokenizer merge crossed the slot
    boundary (possible with byte-BPE when a slot abuts non-space text).
    The reference crashes here with ``TypeError`` (None + int) or a bare
    ``AssertionError`` (``language_model_wrapper.py:107-115``); we raise
    a defined, diagnosable error instead."""


def pll_row_plan(tok, prompt: str, ent_tuple: Sequence[str]) -> tuple[list[int], list[int]]:
    """(input_ids, mask_positions) for one (prompt, tuple) pair — the
    reference's mask-location scheme (``language_model_wrapper.py:
    79-112``): only the FIRST word of each entity is masked/scored,
    located by matching the encoded prefix before the slot.

    Raises :class:`PLLAlignmentError` when the prefix is not a token
    sublist of the sentence or the located span's tokens differ from
    the standalone-encoded entity tokens (the reference's
    ``assert input_ids[l:r] == ent_token_ids``,
    ``language_model_wrapper.py:115``)."""
    import string

    ents = list(ent_tuple)
    for i, e in enumerate(ents):
        if prompt.startswith(f"<ENT{i}>"):
            ents[i] = e.capitalize()  # language_model_wrapper.py:41-43
    sent = get_sent(prompt, ents)
    input_ids = list(tok.encode(sent))
    mask_positions: list[int] = []
    for ent_idx, ent in enumerate(ents):
        prefix = prompt[: prompt.find(f"<ENT{ent_idx}>")].strip()
        for i in range(len(ents)):
            prefix = prefix.replace(f"<ENT{i}>", ents[i])
        prefix_ids = list(tok.encode(prefix, add_special_tokens=False))
        ent_in_sent = prompt[prompt.find(f"<ENT{ent_idx}>"):].split()[0]
        for punc in string.punctuation:
            if punc not in "<>":
                ent_in_sent = ent_in_sent.split(punc)[0]
        ent_in_sent = ent_in_sent.replace(f"<ENT{ent_idx}>", ent)
        ent_in_sent = ent_in_sent.split()[0]  # first word only
        prefixed = f" {ent_in_sent}" if sent[len(prefix)] == " " else ent_in_sent
        ent_token_ids = list(tok.encode(prefixed, add_special_tokens=False))
        if prefix_ids:
            at = find_sublist(input_ids, prefix_ids)
            if at is None:
                raise PLLAlignmentError(
                    f"prefix tokens not a sublist of sentence tokens "
                    f"(slot {ent_idx}): prompt={prompt!r} ents={ents!r} "
                    f"prefix={prefix!r}"
                )
            left = at + len(prefix_ids)
        else:
            left = find_sublist(input_ids, ent_token_ids)
            if left is None:
                raise PLLAlignmentError(
                    f"entity tokens not found in sentence tokens "
                    f"(slot {ent_idx}): prompt={prompt!r} ents={ents!r}"
                )
        got = input_ids[left: left + len(ent_token_ids)]
        if got != ent_token_ids:
            raise PLLAlignmentError(
                f"entity token span mismatch at {left} (slot {ent_idx}): "
                f"prompt={prompt!r} ents={ents!r} "
                f"expected={ent_token_ids} got={got}"
            )
        mask_positions.extend(range(left, left + len(ent_token_ids)))
    if len(mask_positions) != len(set(mask_positions)):
        # two slots resolved to overlapping token spans — possible when
        # entities share a surface form AND punctuation glued to one
        # slot merges into its token (e.g. "<ENT0>'s <ENT1> ." with
        # ents ("A","A") under a tokenizer that keeps "A's" whole: slot
        # 0's first-occurrence search skips the merged token and lands
        # on slot 1's "A"). A token can belong to only one slot, so the
        # plan is internally inconsistent; the reference would silently
        # double-mask here (its span assert checks ids, not occurrence
        # identity) — we uphold the defined-error contract instead.
        # (Fuzz-found r4; real byte-BPE/WordPiece split "A's" and are
        # unaffected.)
        raise PLLAlignmentError(
            f"slot mask spans overlap: prompt={prompt!r} ents={ents!r} "
            f"positions={mask_positions}"
        )
    return input_ids, mask_positions


def remasked_rows(
    input_ids: Sequence[int], mask_positions: Sequence[int], mask_token_id: int
) -> list[tuple[list[int], int, int]]:
    """Left-to-right re-masking rows for one pair: row ``i`` masks
    positions ``i..end`` and is labeled with the gold token at position
    ``i`` (``language_model_wrapper.py:52-62``). → [(ids, pos, label)]"""
    rows = []
    for i, pos in enumerate(mask_positions):
        ids = list(input_ids)
        label = ids[pos]
        for p in mask_positions[i:]:
            ids[p] = mask_token_id
        rows.append((ids, pos, label))
    return rows


def pack_by_token_budget(items: Sequence, length_of, max_tokens: int) -> list[list]:
    """Greedy chunking: consecutive items until the summed length would
    exceed ``max_tokens`` (each chunk keeps >=1 item). Pure — shared by
    the PLL batch packer and the mask-logits batch packer."""
    chunks: list[list] = []
    cur: list = []
    budget = 0
    for it in items:
        n = length_of(it)
        if cur and budget + n > max_tokens:
            chunks.append(cur)
            cur, budget = [], 0
        cur.append(it)
        budget += n
    if cur:
        chunks.append(cur)
    return chunks


def tokenizer_token_masks(model_name: str):  # pragma: no cover - needs transformers
    """(vocab_size, char_ok_mask, banned_ids) from the TOKENIZER alone —
    lets the driver precompute the beam's token masks without loading
    model weights (lm/__init__.token_mask_payload)."""
    if not HAS_TORCH:
        raise NotImplementedError("transformers not available")
    from ..functions.textops import token_text_allowed

    tok = AutoTokenizer.from_pretrained(model_name)
    vocab = tok.vocab_size
    char_ok = np.zeros(vocab, dtype=bool)
    banned = set(tok.all_special_ids)
    for idx in range(vocab):
        text = tok.decode(idx)
        char_ok[idx] = token_text_allowed(text)
        if text.lower().strip() in STOPWORD_SET:
            banned.add(idx)
    return vocab, char_ok, np.array(sorted(banned), dtype=np.int64)


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

    # -- forwards (the ONLY torch-touching hooks; tests override) --------

    def _forward_logits_padded(self, ids_list: Sequence[Sequence[int]]) -> np.ndarray:
        """One padded forward over variable-length id rows →
        [n_rows, max_len, vocab] logits (padding rows are garbage —
        callers index real positions only)."""
        maxlen = max(len(ids) for ids in ids_list)
        pad = self._tok.pad_token_id or 0
        input_ids = torch.full((len(ids_list), maxlen), pad, dtype=torch.long)
        attn = torch.zeros((len(ids_list), maxlen), dtype=torch.long)
        for j, ids in enumerate(ids_list):
            input_ids[j, : len(ids)] = torch.tensor(list(ids))
            attn[j, : len(ids)] = 1
        with torch.no_grad():
            logits = self._model(
                input_ids=input_ids.to(self._device),
                attention_mask=attn.to(self._device),
            ).logits
        return logits.cpu().numpy()

    def _forward_logprob_rows(self, rows: Sequence[tuple[list[int], int, int]]) -> list[float]:
        """[(ids, pos, label)] → log-softmax logprob of label at pos,
        via one padded forward. Shared by the per-pair and the packed
        batch PLL paths."""
        logits = self._forward_logits_padded([r[0] for r in rows])
        out = []
        for j, (_, pos, label) in enumerate(rows):
            row = logits[j, pos]
            m = row.max()
            lse = m + np.log(np.exp(row - m).sum())
            out.append(float(row[label] - lse))
        return out

    # -- mask logits ------------------------------------------------------

    def mask_logits(self, input_text: str) -> np.ndarray:
        return self.mask_logits_batch([input_text])[0]

    def mask_logits_batch(
        self, texts: Sequence[str], max_tokens_per_forward: int = 16384
    ) -> list[np.ndarray]:
        """Packed mask-logit extraction for MANY beam-expansion texts —
        one padded forward per token-budget chunk instead of one per
        (frontier row × prompt) (VERDICT r1 item 1)."""
        encoded = [self._tok.encode(t) for t in texts]
        order = list(range(len(texts)))
        results: list[np.ndarray | None] = [None] * len(texts)
        for chunk in pack_by_token_budget(order, lambda i: len(encoded[i]), max_tokens_per_forward):
            logits = self._forward_logits_padded([encoded[i] for i in chunk])
            for j, i in enumerate(chunk):
                ids = np.asarray(encoded[i])
                sel = np.nonzero(ids == self._tok.mask_token_id)[0]
                results[i] = logits[j, sel]
        return results  # type: ignore[return-value]

    # -- PLL scoring --------------------------------------------------------

    def pll_mask_logprobs(self, prompt: str, ent_tuple: Sequence[str]) -> list[float]:
        input_ids, mask_positions = pll_row_plan(self._tok, prompt, ent_tuple)
        rows = remasked_rows(input_ids, mask_positions, self._tok.mask_token_id)
        if not rows:
            return []
        return self._forward_logprob_rows(rows)

    def pll_mask_logprobs_batch(
        self, pairs: Sequence[tuple[str, Sequence[str]]],
        max_tokens_per_forward: int = 16384,
    ) -> list[list[float]]:
        """Pack the left-to-right re-masked rows of MANY pairs into
        padded forwards bounded by a token budget (the reference runs
        one forward per pair, language_model_wrapper.py:52-62; packing
        across pairs is the 10-100x lever on executors)."""
        rows: list[tuple[list[int], int, int]] = []
        per_pair_counts = []
        for prompt, ents in pairs:
            input_ids, mask_positions = pll_row_plan(self._tok, prompt, ents)
            pair_rows = remasked_rows(input_ids, mask_positions, self._tok.mask_token_id)
            per_pair_counts.append(len(pair_rows))
            rows.extend(pair_rows)

        flat: list[float] = []
        for chunk in pack_by_token_budget(rows, lambda r: len(r[0]), max_tokens_per_forward):
            flat.extend(self._forward_logprob_rows(chunk))

        out, off = [], 0
        for n in per_pair_counts:
            out.append(flat[off: off + n])
            off += n
        return out


_HF_CACHE: dict = {}


def get_cached_hf_lm(model_name: str, num_threads: int = 1) -> "HFMaskedLM":  # pragma: no cover
    if model_name not in _HF_CACHE:
        _HF_CACHE[model_name] = HFMaskedLM(model_name, num_threads=num_threads)
    return _HF_CACHE[model_name]
