from .base import MaskedLM
from .stub import StubMLM, build_stub_lm

__all__ = ["MaskedLM", "StubMLM", "build_stub_lm"]
