from .base import MaskedLM
from .stub import StubMLM, build_stub_lm, get_cached_stub_lm

__all__ = ["MaskedLM", "StubMLM", "build_stub_lm", "get_cached_stub_lm", "resolve_lm"]


def resolve_lm(name: str, seed: int = 42) -> MaskedLM:
    """Per-executor LM resolution: 'stub' → deterministic StubMLM
    singleton; anything else → HuggingFace model name (import-gated)."""
    if name == "stub":
        return get_cached_stub_lm(seed=seed)
    from .hf import get_cached_hf_lm

    return get_cached_hf_lm(name)
