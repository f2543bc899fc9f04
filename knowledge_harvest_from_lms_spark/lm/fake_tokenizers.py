"""Realistic fake tokenizers: byte-BPE (GPT-2/roberta-style) and
WordPiece (BERT-style) — torch-free, deterministic.

The reference's parity-critical PLL mask alignment
(``lm/hf.py:pll_row_plan``, mirroring reference
``models/language_model_wrapper.py:79-115``) had only ever executed
against a whitespace word-level stub and a sentencepiece-style fake
(VERDICT r2 item 1). The reference's actual models are byte-BPE
(roberta: ``Ġ`` space marker, learned merges, GPT-2 pre-tokenizer
with apostrophe contractions) and WordPiece (bert: punctuation-
splitting basic tokenizer + ``##`` continuation pieces). These two
classes reproduce those *structural* behaviors exactly:

- ``ByteBPEFakeTokenizer`` — GPT-2 pre-tokenization regex
  (contractions ``'s 't 're …``, letter runs with optional leading
  space, digit runs, punctuation runs), leading space represented as
  the ``Ġ`` glyph on the first symbol, then genuine BPE: a merge
  table *trained* (deterministically, standard highest-frequency-pair
  BPE) on the fixture world, applied greedily by merge rank per
  pre-token — so ``"dog"`` and ``" dog"`` (``Ġdog``) tokenize through
  different learned merges, exactly the property that makes
  ``encode(prefix)``-vs-``encode(sent)`` alignment nontrivial.
- ``WordPieceFakeTokenizer`` — BERT basic tokenizer (whitespace
  split, every punctuation char split into its own token, mask token
  never split) then greedy longest-match WordPiece with ``##``
  continuations; decode joins with spaces and fuses ``##`` pieces
  (``convert_tokens_to_string`` semantics).

Coverage of arbitrary text is guaranteed char-level: all printable
ASCII (and every char seen in training) is in the base vocabulary;
anything else falls back to stable hashed ids in a reserved range.
Ids are assigned deterministically (sorted vocab), so executors that
never exchanged state agree on every id — beam token ids cross
shuffle boundaries.

``FakeByteBPEMLM`` / ``FakeWordPieceMLM`` plug these tokenizers into
the REAL ``HFMaskedLM`` code paths (packing, PLL row plans, decode
plumbing) overriding only the torch forward with the shared seeded
numpy forward, the same pattern as ``lm/fake.FakeSubwordMLM``.
Resolved via ``resolve_lm("fake-bpe")`` / ``resolve_lm("fake-wp")``.
"""

from __future__ import annotations

import re
import string
from collections import Counter
from collections.abc import Sequence

import numpy as np

from .fake import _stable64, deterministic_logits
from .hf import HFMaskedLM

# Simplified-ASCII version of the GPT-2 pre-tokenization pattern
# (contractions, " ?letters", " ?digits", " ?punct-run", whitespace).
_GPT2_SPLIT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)

_G = "Ġ"  # Ġ — GPT-2 byte-level space marker


def _training_texts() -> list[str]:
    """Deterministic training corpus: the fixture world (prompts with
    slots blanked to representative entities, seed tuples, stub filler
    words). Shapes the learned merges/pieces only — coverage of other
    text comes from the char-level base vocabulary."""
    from ..sources.fixtures import FIXTURE_RELATIONS
    from .stub import FILLER_WORDS

    texts: list[str] = []
    for rel in FIXTURE_RELATIONS:
        for p in list(rel["init_prompts"]) + list(rel.get("prompts", [])):
            texts.append(
                p.replace("<ENT0>", " dog ").replace("<ENT1>", " house ")
                .replace("<ENT2>", " park ")
            )
        for tup in rel["seed_ent_tuples"]:
            texts.append(" ".join(e.replace("_", " ") for e in tup))
            texts.append(" ".join(e.replace("_", " ").capitalize() for e in tup))
    texts.extend(f" {w} {w.capitalize()}" for w in sorted(FILLER_WORDS))
    return texts


# ---------------------------------------------------------------------------
# byte-BPE (GPT-2 / roberta style)
# ---------------------------------------------------------------------------

def _pretoken_counts(texts: Sequence[str]) -> Counter:
    counts: Counter = Counter()
    for t in texts:
        for m in _GPT2_SPLIT.findall(t):
            if not m.isspace():
                counts[m] += 1
    return counts


def _initial_syms(pretoken: str) -> list[str]:
    """Char symbols; a leading space becomes the standalone Ġ symbol
    (merges may later fuse it with following chars, as in GPT-2)."""
    if pretoken.startswith(" "):
        return [_G] + list(pretoken[1:])
    return list(pretoken)


def _train_bpe(counts: Counter, n_merges: int) -> list[tuple[str, str]]:
    """Standard BPE merge learning; ties broken lexically so the table
    is deterministic regardless of dict order."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in counts.items():
        syms = tuple(_initial_syms(w))
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        fused = best[0] + best[1]
        new: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return merges


class ByteBPEFakeTokenizer:
    """GPT-2/roberta-style tokenizer surface (encode/decode/specials)
    over a deterministically trained merge table."""

    mask_token = "<mask>"
    BOS_ID, PAD_ID, EOS_ID, UNK_ID, MASK_ID = 0, 1, 2, 3, 4
    mask_token_id = MASK_ID
    pad_token_id = PAD_ID
    all_special_ids = [BOS_ID, PAD_ID, EOS_ID, UNK_ID, MASK_ID]

    _N_RESERVE = 512  # hashed fallback range for chars never seen

    def __init__(self, n_merges: int = 800):
        merges = _train_bpe(_pretoken_counts(_training_texts()), n_merges)
        self._ranks = {pair: i for i, pair in enumerate(merges)}
        pieces: set[str] = {_G}
        pieces.update(string.printable)
        for t in _training_texts():
            pieces.update(t)
        for a, b in merges:
            pieces.add(a + b)
        pieces.discard("")
        self._piece_to_id: dict[str, int] = {}
        self._rev: dict[int, str] = {
            self.BOS_ID: "<s>", self.PAD_ID: "<pad>", self.EOS_ID: "</s>",
            self.UNK_ID: "<unk>", self.MASK_ID: self.mask_token,
        }
        nxt = 5
        for p in sorted(pieces):
            self._piece_to_id[p] = nxt
            self._rev[nxt] = p
            nxt += 1
        self._fixed_end = nxt
        self.vocab_size = nxt + self._N_RESERVE
        self._bpe_cache: dict[str, tuple[str, ...]] = {}

    def _pid(self, piece: str) -> int:
        pid = self._piece_to_id.get(piece)
        if pid is None:  # unseen char → stable hashed reserve id
            pid = self._fixed_end + _stable64(piece) % self._N_RESERVE
            self._rev[pid] = piece
        return pid

    def _bpe(self, pretoken: str) -> tuple[str, ...]:
        cached = self._bpe_cache.get(pretoken)
        if cached is not None:
            return cached
        word = tuple(_initial_syms(pretoken))
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
        self._bpe_cache[pretoken] = word
        return word

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids: list[int] = []
        # the mask token is an added token: split out atomically,
        # swallowing the conventional single leading space (roberta's
        # lstrip-ing <mask> behavior)
        for part in re.split(r" ?(<mask>)", text):
            if not part:
                continue
            if part == self.mask_token:
                ids.append(self.MASK_ID)
                continue
            for pre in _GPT2_SPLIT.findall(part):
                if pre.isspace():
                    continue
                ids.extend(self._pid(s) for s in self._bpe(pre))
        if add_special_tokens:
            return [self.BOS_ID] + ids + [self.EOS_ID]
        return ids

    def decode(self, ids) -> str:
        if isinstance(ids, (int, np.integer)):
            ids = [int(ids)]
        out = []
        for i in ids:
            i = int(i)
            if i in (self.BOS_ID, self.EOS_ID, self.PAD_ID):
                continue
            out.append(self._rev.get(i, "<unk>"))
        return "".join(out).replace(_G, " ")


# ---------------------------------------------------------------------------
# WordPiece (BERT style)
# ---------------------------------------------------------------------------

_PUNCT = set(string.punctuation)


def _basic_tokenize(text: str) -> list[str]:
    """BERT BasicTokenizer: whitespace split, then every punctuation
    char becomes its own token."""
    out: list[str] = []
    for chunk in text.split():
        cur = ""
        for ch in chunk:
            if ch in _PUNCT:
                if cur:
                    out.append(cur)
                    cur = ""
                out.append(ch)
            else:
                cur += ch
        if cur:
            out.append(cur)
    return out


class WordPieceFakeTokenizer:
    """BERT-style (cased) tokenizer surface: basic tokenization +
    greedy longest-match WordPiece with ``##`` continuations."""

    mask_token = "[MASK]"
    PAD_ID, UNK_ID, CLS_ID, SEP_ID, MASK_ID = 0, 1, 2, 3, 4
    mask_token_id = MASK_ID
    pad_token_id = PAD_ID
    all_special_ids = [PAD_ID, UNK_ID, CLS_ID, SEP_ID, MASK_ID]

    _N_RESERVE = 512
    # Max piece length for BOTH vocab construction and greedy matching.
    # They must agree: a piece the matcher cannot reach is dead vocab
    # for encode() yet still selectable by the logits-driven beam and
    # by grounding — an inconsistent tokenizer (r3 review finding). 12
    # keeps real-BERT-like whole-word tokens ("playground") encodable
    # AND generable; continuations use a shorter span so multi-piece
    # words still occur (the structure this fake exists to exercise).
    _MAX_PIECE = 12
    _MAX_CONT = 6

    def __init__(self):
        pieces: set[str] = set()
        for ch in string.printable:
            if not ch.isspace():
                pieces.add(ch)
                pieces.add("##" + ch)
        words: Counter = Counter()
        for t in _training_texts():
            for w in _basic_tokenize(t):
                words[w] += 1
        for w, _c in words.items():
            pieces.add(w[: self._MAX_PIECE])
            for start in range(1, len(w)):
                piece = w[start: start + self._MAX_CONT]
                if piece:
                    pieces.add("##" + piece)
        self._piece_to_id: dict[str, int] = {}
        self._rev: dict[int, str] = {
            self.PAD_ID: "[PAD]", self.UNK_ID: "[UNK]", self.CLS_ID: "[CLS]",
            self.SEP_ID: "[SEP]", self.MASK_ID: self.mask_token,
        }
        nxt = 5
        for p in sorted(pieces):
            self._piece_to_id[p] = nxt
            self._rev[nxt] = p
            nxt += 1
        self._fixed_end = nxt
        self.vocab_size = nxt + self._N_RESERVE

    def _pid(self, piece: str) -> int:
        pid = self._piece_to_id.get(piece)
        if pid is None:
            pid = self._fixed_end + _stable64(piece) % self._N_RESERVE
            self._rev[pid] = piece
        return pid

    def _wordpiece(self, word: str) -> list[str]:
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = min(len(word), start + self._MAX_PIECE)
            cur = None
            while end > start:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self._piece_to_id:
                    cur = sub
                    break
                end -= 1
            if cur is None:  # unseen char → single-char fallback
                cur = ("##" if start > 0 else "") + word[start]
                end = start + 1
            pieces.append(cur)
            start = end
        return pieces

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids: list[int] = []
        for part in re.split(r"(\[MASK\])", text):
            if not part:
                continue
            if part == self.mask_token:
                ids.append(self.MASK_ID)
                continue
            for w in _basic_tokenize(part):
                ids.extend(self._pid(p) for p in self._wordpiece(w))
        if add_special_tokens:
            return [self.CLS_ID] + ids + [self.SEP_ID]
        return ids

    def decode(self, ids) -> str:
        """``convert_tokens_to_string`` semantics: join with spaces,
        fuse ``##`` continuations."""
        if isinstance(ids, (int, np.integer)):
            ids = [int(ids)]
        toks = []
        for i in ids:
            i = int(i)
            if i in (self.CLS_ID, self.SEP_ID, self.PAD_ID):
                continue
            toks.append(self._rev.get(i, "[UNK]"))
        return " ".join(toks).replace(" ##", "").strip()


# ---------------------------------------------------------------------------
# MLM wrappers riding the real HF-backend code paths
# ---------------------------------------------------------------------------

def _stopword_banned(tok) -> np.ndarray:
    """Specials + every single-token form of a stopword (reference
    ``language_model_wrapper.py:23-27`` bans by decoded text)."""
    from ..functions.stopwords import STOPWORD_SET

    banned = set(tok.all_special_ids)
    for w in STOPWORD_SET:
        for form in (w, " " + w, w.capitalize(), " " + w.capitalize()):
            ids = tok.encode(form, add_special_tokens=False)
            if len(ids) == 1:
                banned.add(ids[0])
    return np.array(sorted(banned), dtype=np.int64)


class FakeByteBPEMLM(HFMaskedLM):
    def __init__(self, seed: int = 42):  # no torch, no downloads
        self._tok = ByteBPEFakeTokenizer()
        self.mask_token = self._tok.mask_token
        self._seed = seed
        self._banned = _stopword_banned(self._tok)

    def _forward_logits_padded(self, ids_list: Sequence[Sequence[int]]) -> np.ndarray:
        return deterministic_logits(ids_list, self._tok.vocab_size, self._seed)


class FakeWordPieceMLM(HFMaskedLM):
    def __init__(self, seed: int = 42):
        self._tok = WordPieceFakeTokenizer()
        self.mask_token = self._tok.mask_token
        self._seed = seed
        self._banned = _stopword_banned(self._tok)

    def _forward_logits_padded(self, ids_list: Sequence[Sequence[int]]) -> np.ndarray:
        return deterministic_logits(ids_list, self._tok.vocab_size, self._seed)


_CACHE: dict[tuple[str, int], HFMaskedLM] = {}


def get_cached_bpe_lm(seed: int = 42) -> FakeByteBPEMLM:
    key = ("bpe", seed)
    if key not in _CACHE:
        _CACHE[key] = FakeByteBPEMLM(seed)
    return _CACHE[key]  # type: ignore[return-value]


def get_cached_wp_lm(seed: int = 42) -> FakeWordPieceMLM:
    key = ("wp", seed)
    if key not in _CACHE:
        _CACHE[key] = FakeWordPieceMLM(seed)
    return _CACHE[key]  # type: ignore[return-value]
