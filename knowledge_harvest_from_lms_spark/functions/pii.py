"""PII redaction for training corpora (the Dolma / CCNet hygiene
step): emails, IPv4 addresses and international-ish phone numbers are
replaced with stable placeholder tokens so downstream dedup and
n-gram stats see identical masked text for identical structure.

Pure `regexp_replace` chains — scan-fused, whole-stage codegen, zero
shuffle. Patterns use ASCII classes and RE2-compatible syntax only so
the Java engine and the DuckDB oracle (q52) agree byte-for-byte; they
are deliberately conservative (precision over recall): a miss leaves
one string in one document, a false positive corrupts legitimate
text corpus-wide. Order matters and is fixed: emails first (an email
must not first lose digits to the phone pass), then IPv4, then
phones.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# kind -> (pattern, replacement token)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ipv4": (
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    # +CC (1-3 digits) then 8-12 digits in groups separated by
    # space/dot/dash — anchored on the leading '+' to stay precise
    "phone": (
        r"\+[0-9]{1,3}[ .-]?[0-9]{2,4}([ .-]?[0-9]{2,4}){2,3}\b",
        "<PHONE>",
    ),
}

_ORDER = ("email", "ipv4", "phone")


def redact_pii(text: Column, kinds: tuple[str, ...] = _ORDER) -> Column:
    """Replace each PII kind with its placeholder token, in the fixed
    safe order (module note)."""
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown pii kinds: {sorted(unknown)}")
    out = text
    for kind in _ORDER:
        if kind in kinds:
            pat, tok = PII_PATTERNS[kind]
            out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (for corpus auditing dashboards) —
    counted on the ORIGINAL text, in the same pass shape."""
    return {
        kind: F.regexp_count(text, F.lit(pat))
        for kind, (pat, _) in PII_PATTERNS.items()
    }
