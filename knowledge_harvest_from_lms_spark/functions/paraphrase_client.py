"""OpenAI-compatible paraphrase client adapter (S10 production wiring).

The prompt-search plan takes an injectable ``paraphrase_fn(sentence)
-> str`` (``functions/paraphrase.py``); tests use a deterministic
fake. This module supplies the production implementation the reference
gets from ``models/gpt3.py:9-28`` — a text-completions call with the
prompt ``"paraphrase:\\n{sent}\\n"`` (reference
``search_prompts.py:23``) — against ANY OpenAI-compatible endpoint,
with zero third-party dependencies (stdlib urllib only).

Env-gated and never exercised over the network in CI: the transport is
injectable, and :func:`paraphrase_fn_from_env` returns None unless the
environment opts in. Paraphrase search is a driver-side, dev-time loop
(tens of calls per relation), so a plain synchronous client is the
right scale; the harvested prompts are then broadcast to executors.
"""

from __future__ import annotations

import json
import os
import urllib.request
from collections.abc import Callable

DEFAULT_API_BASE = "https://api.openai.com/v1"
DEFAULT_MODEL = "gpt-3.5-turbo-instruct"  # completions-capable


def _http_post_json(url: str, payload: dict, api_key: str | None, timeout: float) -> dict:
    """Stdlib transport. Kept tiny and injectable so unit tests assert
    request shaping without any network."""
    body = json.dumps(payload).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    if api_key:
        req.add_header("Authorization", f"Bearer {api_key}")
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # pragma: no cover
        return json.loads(resp.read().decode())


def make_openai_paraphrase_fn(
    api_base: str | None = None,
    api_key: str | None = None,
    model: str | None = None,
    temperature: float = 1.0,
    max_tokens: int = 30,
    timeout: float = 30.0,
    transport: Callable[[str, dict, str | None, float], dict] | None = None,
) -> Callable[[str], str]:
    """A ``paraphrase_fn`` for ``plans/prompt_search.py`` that calls an
    OpenAI-compatible ``/completions`` endpoint with the reference's
    request shape (``models/gpt3.py:9-28``: temperature 1, max_tokens
    30, top_p 1, no penalties, n=1) and returns
    ``choices[0].text`` (``search_prompts.py:23-25``)."""
    api_base = (api_base or os.environ.get("PARAPHRASE_API_BASE", DEFAULT_API_BASE)).rstrip("/")
    api_key = api_key if api_key is not None else os.environ.get("PARAPHRASE_API_KEY") or os.environ.get("OPENAI_API_KEY")
    model = model or os.environ.get("PARAPHRASE_MODEL", DEFAULT_MODEL)
    send = transport or _http_post_json

    def paraphrase_fn(sentence: str) -> str:
        payload = {
            "model": model,
            "prompt": f"paraphrase:\n{sentence}\n",
            "temperature": temperature,
            "max_tokens": max_tokens,
            "top_p": 1.0,
            "frequency_penalty": 0,
            "presence_penalty": 0,
            "n": 1,
        }
        resp = send(f"{api_base}/completions", payload, api_key, timeout)
        return resp["choices"][0]["text"]

    return paraphrase_fn


def paraphrase_fn_from_env() -> Callable[[str], str] | None:
    """Production seam: a ready paraphrase_fn iff the environment
    EXPLICITLY opts in via a ``PARAPHRASE_*`` variable
    (``PARAPHRASE_API_BASE`` or ``PARAPHRASE_API_KEY``); None
    otherwise. A bare ambient ``OPENAI_API_KEY`` — a common variable on
    developer machines — is NOT an opt-in (it would silently construct
    a live network client on any machine where it happens to be
    exported); it serves only as the credential once a ``PARAPHRASE_*``
    variable has opted in (``make_openai_paraphrase_fn`` falls back to
    it for the key)."""
    if os.environ.get("PARAPHRASE_API_BASE") or os.environ.get("PARAPHRASE_API_KEY"):
        return make_openai_paraphrase_fn()
    return None
