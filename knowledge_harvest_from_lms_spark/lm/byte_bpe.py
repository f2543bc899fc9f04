"""Real-vocab byte-level BPE tokenizer (GPT-2 / RoBERTa semantics,
no dependencies).

Loads the exact artifact pair HF's ``tokenizer.save_vocabulary(dir)``
writes for RoBERTa — ``vocab.json`` (token → id) and ``merges.txt``
(one merge per line after the ``#version`` header) — and reimplements
the publicly documented GPT-2 algorithm: the byte→unicode alphabet
(every byte maps to a printable character; space becomes ``Ġ``), the
pre-tokenizer regex, and lowest-rank-first pair merging. With
``lm/numpy_lm.py``'s RoBERTa forward this closes the tokenizer side of
scoring roberta-base / roberta-large checkpoints torch-free.

Divergence note: Python ``re`` has no ``\\p{L}``/``\\p{N}``; the
pattern uses ``[^\\W\\d_]`` (unicode letters) and ``\\d`` (decimal
digits), which differs from GPT-2's only for non-decimal numerals
(Nl/No categories) — irrelevant for the reference's English relation
prompts, and documented rather than hidden. Because ``_`` is in
``\\w`` but NOT in ``\\p{L}``/``\\p{N}``, the punctuation branch
explicitly includes ``_`` (``[^\\w\\s]|_``) so underscores join
punctuation runs exactly as GPT-2's ``[^\\s\\p{L}\\p{N}]+`` does —
without it ``re.findall`` silently DROPS underscores (``foo_bar`` →
``['foo','bar']``), diverging from the real checkpoint tokenizer on
any underscore-containing text (entity names, code, wiki titles).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

_GPT2_PAT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→printable-char table (public)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


class RealByteBPETokenizer:
    """``vocab.json`` + ``merges.txt``-driven RoBERTa tokenizer twin.

    Specials follow RoBERTa's fixed layout: ``<s>``/``<pad>``/
    ``</s>``/``<unk>`` plus the added ``<mask>`` (which lstrips one
    conventional preceding space, as HF's AddedToken does)."""

    def __init__(self, vocab_json: str, merges_txt: str):
        with open(vocab_json, encoding="utf-8") as f:
            self._piece_to_id: dict[str, int] = json.load(f)
        self._id_to_piece = {v: k for k, v in self._piece_to_id.items()}
        ranks: dict[tuple[str, str], int] = {}
        with open(merges_txt, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                a, _, b = line.partition(" ")
                ranks[(a, b)] = len(ranks)
        self._ranks = ranks
        self.vocab_size = max(self._piece_to_id.values()) + 1
        self.mask_token = "<mask>"
        self.bos_token_id = self._piece_to_id["<s>"]
        self.eos_token_id = self._piece_to_id["</s>"]
        self.pad_token_id = self._piece_to_id["<pad>"]
        self.unk_token_id = self._piece_to_id["<unk>"]
        self.mask_token_id = self._piece_to_id["<mask>"]
        self.all_special_ids = [
            self.bos_token_id, self.pad_token_id, self.eos_token_id,
            self.unk_token_id, self.mask_token_id,
        ]
        self._cache: dict[str, tuple[str, ...]] = {}

    def _bpe(self, pretoken: str) -> tuple[str, ...]:
        cached = self._cache.get(pretoken)
        if cached is not None:
            return cached
        word = tuple(
            _B2U[b] for b in pretoken.encode("utf-8")
        )
        while len(word) > 1:
            pairs = set(zip(word, word[1:]))
            best = min(pairs, key=lambda p: self._ranks.get(p, 1 << 30))
            if best not in self._ranks:
                break
            fused = best[0] + best[1]
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(fused)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        self._cache[pretoken] = word
        return word

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids: list[int] = []
        for part in re.split(r" ?(<mask>)", text):
            if not part:
                continue
            if part == self.mask_token:
                ids.append(self.mask_token_id)
                continue
            for pre in _GPT2_PAT.findall(part):
                for piece in self._bpe(pre):
                    ids.append(self._piece_to_id.get(piece, self.unk_token_id))
        if add_special_tokens:
            return [self.bos_token_id] + ids + [self.eos_token_id]
        return ids

    def decode(self, ids) -> str:
        if isinstance(ids, (int, np.integer)):
            ids = [int(ids)]
        pieces: list[str] = []
        for i in ids:
            i = int(i)
            if i in (self.bos_token_id, self.eos_token_id, self.pad_token_id):
                continue
            pieces.append(self._id_to_piece.get(i, "<unk>"))
        buf = bytearray()
        out: list[str] = []
        for p in pieces:
            if p in ("<unk>", self.mask_token):
                if buf:
                    out.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                out.append(p)
                continue
            for ch in p:
                b = _U2B.get(ch)
                if b is None:  # not a byte-alphabet char (defensive)
                    buf.extend(ch.encode("utf-8"))
                else:
                    buf.append(b)
        if buf:
            out.append(buf.decode("utf-8", errors="replace"))
        return "".join(out)


def has_bpe_artifacts(model_dir: str) -> bool:
    return os.path.exists(os.path.join(model_dir, "vocab.json")) and os.path.exists(
        os.path.join(model_dir, "merges.txt")
    )
