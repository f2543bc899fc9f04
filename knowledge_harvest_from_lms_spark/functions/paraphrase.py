"""Prompt-paraphrase slot recovery + accept/dedup kernels (S10/C9 —
the pure half of the reference's prompt search, reference
``search_prompts.py:11-51`` transformation tables and
``search_prompts.py:54-106`` accept loop).

The external paraphraser itself (the reference uses GPT-3,
``models/gpt3.py:9-28``) is INJECTED as ``paraphrase_fn(sentence) ->
str`` — production wires an API client; tests use a deterministic
fake. Everything else — slot recovery via the transformation tables,
first-sentence extraction, fuzz-ratio dedup, the accept loop — is
deterministic, implemented here, and unit-tested byte-exactly.

``fuzz_ratio`` reimplements the reference's ``thefuzz.fuzz.ratio``
exactly (indel similarity: ``2*LCS / (len(a)+len(b))``, the
python-Levenshtein ``ratio`` with substitution cost 2) — symmetric by
construction, no difflib junk-heuristic divergence.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from .textops import fix_prompt_style, get_n_ents, get_sent

# reference search_prompts.py:11-13
TRANSFORMATIONS_SENT = [["", ""], ["a ", ""], ["the ", ""]]
TRANSFORMATIONS_ENT = [
    ["", ""], ["being", "is"], ["being", "are"], ["ing", ""], ["ing", "e"],
]

_SENT_END = re.compile(r"(?<=[.!?])\s+")


def first_sentence(text: str) -> str:
    """First sentence of a paraphraser response — stand-in for the
    reference's ``nltk.sent_tokenize(...)[0]`` (search_prompts.py:25)."""
    text = text.strip()
    parts = _SENT_END.split(text, maxsplit=1)
    return parts[0] if parts else text


def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length, two-row DP (prompt strings
    are short; this runs only in the driver-side accept/dedup loop)."""
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            cur.append(prev[j] + 1 if ca == cb else max(prev[j + 1], cur[j]))
        prev = cur
    return prev[-1]


def fuzz_ratio(a: str, b: str) -> int:
    """0-100 similarity, exact ``thefuzz.fuzz.ratio`` semantics
    (search_prompts.py:92-96): Levenshtein with substitution cost 2 →
    ``round(100 * 2*LCS / (len(a)+len(b)))``. Symmetric."""
    total = len(a) + len(b)
    if total == 0:
        return 100
    return int(round(200 * _lcs_len(a, b) / total))


def recover_slots(para_sent: str, ent_tuple: Sequence[str]) -> str | None:
    """Recover ``<ENTi>`` slots from a paraphrased sentence via the
    reference's transformation tables (search_prompts.py:33-48): for
    each entity, try (sentence-transform × entity-transform) pairs
    until the transformed entity occurs EXACTLY once, then substitute
    the slot. Returns None when any entity can't be pinned to one
    occurrence."""
    prompt = para_sent
    for idx, ent in enumerate(ent_tuple):
        ent = ent.lower()
        for trans_sent in TRANSFORMATIONS_SENT:
            for trans_ent in TRANSFORMATIONS_ENT:
                if prompt.count(f"<ENT{idx}>") == 0:
                    transed_prompt = prompt.replace(*trans_sent)
                    transed_ent = ent.replace(*trans_ent)
                    if transed_ent and transed_prompt.count(transed_ent) == 1:
                        prompt = transed_prompt.replace(transed_ent, f"<ENT{idx}>")
        if prompt.count(f"<ENT{idx}>") != 1:
            return None
    return prompt


def get_paraphrase_prompt(
    paraphrase_fn: Callable[[str], str],
    prompt: str,
    ent_tuple: Sequence[str],
    max_tries: int = 5,
) -> str | None:
    """One slotted paraphrase of ``prompt`` under ``ent_tuple``
    (reference ``get_paraphrase_prompt``, search_prompts.py:16-51):
    fill the prompt, ask the paraphraser (≤ ``max_tries`` samples),
    normalize (first sentence, strip, lower), recover slots."""
    assert get_n_ents(prompt) == len(ent_tuple)
    ent_tuple = [e.lower() for e in ent_tuple]
    sent = get_sent(prompt, list(ent_tuple))
    for _ in range(max_tries):
        para_sent = first_sentence(paraphrase_fn(sent))
        para_sent = para_sent.strip().strip(".").lower()
        recovered = recover_slots(para_sent, ent_tuple)
        if recovered is not None:
            return recovered
    return None


def search_prompts(
    init_prompts: Sequence[str],
    seed_ent_tuples: Sequence[Sequence[str]],
    paraphrase_fn: Callable[[str], str],
    similarity_threshold: int = 75,
    max_tries: int = 5,
) -> list[str]:
    """The reference's accept/dedup loop (search_prompts.py:54-106):
    repeatedly paraphrase (init prompts twice per round, then accepted
    prompts) × seed tuples; accept a new prompt only when its max
    fuzz-ratio against accepted prompts is < threshold; keep prompts
    sorted by length; stop when ≥10 accepted, nothing new, or no
    acceptance happened in a round; finally fix_prompt_style."""
    cache: dict[str, str | None] = {}
    prompts: list[str] = []
    while True:
        new_prompts = []
        for prompt in list(init_prompts) + list(init_prompts) + prompts:
            for ent_tuple in seed_ent_tuples:
                ent_tuple = [e.replace("_", " ") for e in ent_tuple]
                request_str = f"{prompt} ||| {ent_tuple}"
                if request_str not in cache or prompt in init_prompts:
                    cache[request_str] = get_paraphrase_prompt(
                        paraphrase_fn, prompt, ent_tuple, max_tries
                    )
                para_prompt = cache[request_str]
                if para_prompt is not None and \
                        para_prompt not in list(init_prompts) + prompts:
                    new_prompts.append(para_prompt)
            if len(set(prompts + new_prompts)) >= 20:
                break

        if len(new_prompts) == 0:
            break

        flag = False
        for new_prompt in sorted(new_prompts, key=len):
            if len(prompts) == 0 or max(
                fuzz_ratio(new_prompt, p) for p in prompts
            ) < similarity_threshold:
                prompts.append(new_prompt)
                flag = True
        # reference sorts the set by length only (python-set tie order,
        # nondeterministic); we tie-break lexically for determinism
        prompts = sorted(set(prompts), key=lambda s: (len(s), s))
        if len(prompts) >= 10 or flag is False:
            break

    return [fix_prompt_style(p) for p in prompts]
