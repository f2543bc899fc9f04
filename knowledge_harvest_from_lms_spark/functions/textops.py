"""Pure-Python prompt/slot kernels — the parity-critical core.

These reproduce the *semantics* of the reference's string utilities
(reference ``data_utils/data_utils.py:16-81``) with fresh
implementations. They are deliberately kept as plain functions shared
between driver code, Arrow UDF bodies, and tests, so casing / slot /
mask arithmetic is defined in exactly one place (SURVEY.md §2.8 C1-C5).
"""

from __future__ import annotations

import re

from .stopwords import STOPWORD_SET

SLOT_RE = re.compile(r"<ENT([0-9]+)>")
_PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")


def is_valid_prompt(prompt: str) -> bool:
    """A ``<ENT`` slot may only be preceded by a space or a double quote
    (or start the prompt). Reference ``data_utils/data_utils.py:16-21``."""
    for m in SLOT_RE.finditer(prompt):
        i = m.start()
        if i > 0 and prompt[i - 1] not in (" ", '"'):
            return False
    return True


def get_n_ents(prompt: str) -> int:
    """Arity = count of consecutive slots ``<ENT0>``, ``<ENT1>``, ...
    present in the prompt. Reference ``data_utils/data_utils.py:24-28``."""
    n = 0
    while f"<ENT{n}>" in prompt:
        n += 1
    return n


def get_sent(prompt: str, ent_tuple: list[str]) -> str:
    """Substitute entities into their slots.
    Reference ``data_utils/data_utils.py:31-36``."""
    sent = prompt
    for idx, ent in enumerate(ent_tuple):
        sent = sent.replace(f"<ENT{idx}>", ent)
    return sent


def get_mask_place(ent_idx: int, n_masks: list[int], prompt: str) -> int:
    """Index of entity ``ent_idx``'s first mask among all masks, in
    prompt (textual) slot order. Reference ``data_utils/data_utils.py:39-48``."""
    mask_idx = 0
    for m in SLOT_RE.finditer(prompt):
        slot = int(m.group(1))
        if slot == ent_idx:
            break
        mask_idx += n_masks[slot]
    return mask_idx


def get_n_masks(t: int, n_ents: int, max_ent_subwords: int) -> list[int]:
    """Decode subword-count assignment ``t`` (mixed-radix, entity 0 is
    the least-significant digit) into per-entity mask counts.
    Reference ``data_utils/data_utils.py:51-57``."""
    n_masks = []
    for _ in range(n_ents):
        n_masks.append(t % max_ent_subwords + 1)
        t //= max_ent_subwords
    return n_masks


def get_masked_prompt(prompt: str, n_masks: list[int], mask_token: str) -> str:
    """Replace each slot with its run of mask tokens.
    Reference ``data_utils/data_utils.py:60-65``."""
    out = prompt
    for ent_idx, k in enumerate(n_masks):
        out = out.replace(f"<ENT{ent_idx}>", mask_token * k)
    return out


def fix_prompt_style(prompt: str) -> str:
    """Strip surrounding spaces/periods, upper-case a leading alpha
    char, append ``" ."``. Reference ``data_utils/data_utils.py:68-73``."""
    prompt = prompt.strip(" .")
    if prompt and prompt[0].isalpha():
        prompt = prompt[0].upper() + prompt[1:]
    return prompt + " ."


def find_sublist(a: list, b: list) -> int | None:
    """First index where list ``b`` occurs inside list ``a``.
    Reference ``data_utils/data_utils.py:76-81``."""
    nb = len(b)
    for i in range(len(a) - nb + 1):
        if a[i : i + nb] == b:
            return i
    return None


# ---------------------------------------------------------------------------
# Candidate-entity predicates (reference models/entity_tuple_searcher.py:130-167)
# Pure functions; the Spark-side equivalents live in operators/ as Column
# expressions, and these definitions are the oracle they are tested against.
# ---------------------------------------------------------------------------


def entity_passes_filters(pred_ent: str) -> bool:
    """Standalone entity filters F4-F6 (SURVEY.md §2.2).

    Rejects: any stopword word; total length (spaces removed) <= 2;
    any single-char word; all words <= 2 chars; ``"word word"`` repeats.
    Reference ``models/entity_tuple_searcher.py:133-152``.
    """
    words = pred_ent.split()
    if not words:
        return False
    if any(w in STOPWORD_SET for w in words):
        return False
    if len(pred_ent.replace(" ", "")) <= 2:
        return False
    if min(len(w) for w in words) <= 1:
        return False
    if max(len(w) for w in words) <= 2:
        return False
    if len(words) > 1 and len(set(words)) == 1:
        return False
    return True


def entity_conflicts_with_tuple(pred_ent: str, cur_ent_tuple: list[str]) -> bool:
    """Intra-tuple duplicate filter F7: equal modulo spaces, or one is a
    prefix of the other ("play" vs "playing").
    Reference ``models/entity_tuple_searcher.py:154-162``."""
    squeezed = pred_ent.replace(" ", "")
    for ent in cur_ent_tuple:
        if squeezed == ent.replace(" ", ""):
            return True
        if ent.startswith(pred_ent) or pred_ent.startswith(ent):
            return True
    return False


def entity_in_any_prompt(pred_ent: str, prompts: list[str]) -> bool:
    """Entity-in-prompt filter F8.
    Reference ``models/entity_tuple_searcher.py:164-167``."""
    return any(pred_ent in p for p in prompts)


def token_text_allowed(token_text: str) -> bool:
    """Token char filter F9: needs at least one alpha char and no
    punctuation. Reference ``models/entity_tuple_searcher.py:212-217``."""
    if not any(ch.isalpha() for ch in token_text):
        return False
    if any(ch in _PUNCT for ch in token_text):
        return False
    return True


def casing_variants(ent_tuple: list[str]) -> list[list[str]]:
    """All 2^n title-casing variants of a tuple, in the reference's
    binary-code order (bit i of the code controls entity i, MSB-first
    over the zero-padded code). Reference
    ``models/knowledge_harvester.py:96-102``."""
    n = len(ent_tuple)
    out = []
    for t in range(1 << n):
        code = format(t, "b").rjust(n, "0")
        out.append(
            [ent.title() if b == "1" else ent for b, ent in zip(code, ent_tuple)]
        )
    return out
