"""PII redaction for training corpora (the Dolma / CCNet hygiene
step): emails, IPv4 addresses and international-ish phone numbers are
replaced with stable placeholder tokens so downstream dedup and
n-gram stats see identical masked text for identical structure.

Pure `regexp_replace` chains — scan-fused, whole-stage codegen, zero
shuffle. Patterns use ASCII classes and RE2-compatible syntax only
(NO lookarounds — DuckDB's RE2 has none) so the Java engine and the
DuckDB oracle (q52) agree byte-for-byte; they are deliberately
conservative (precision over recall): a miss leaves one string in
one document, a false positive corrupts legitimate text corpus-wide.
Concretely for IPv4: octets are range-checked (<=255) and the match
must not be preceded by a letter/digit/dot — `v10.2.3.4` and
`2.14.1.300` stay untouched. The leading boundary is a CAPTURED
group re-inserted by the replacement (the RE2-compatible stand-in
for lookbehind); the residual known false positive is a quad
followed by `.digit` (`1.2.3.4.5` -> `<IP>.5`), accepted and
documented.

Order matters and is fixed: emails first (an email must not first
lose digits to the phone pass), then IPv4, then phones — and
`pii_counts` counts each kind on the PROGRESSIVELY redacted text, so
counts agree exactly with what `redact_pii` replaces (counting every
pattern on the original text would double-count one span, e.g. the
digit run inside `+4915112345678@host.de`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

# kind -> (pattern, token, leading-boundary-group?)
PII_PATTERNS: dict[str, tuple[str, str, bool]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
        False,
    ),
    "ipv4": (
        r"(^|[^0-9A-Za-z.])(" + _OCTET + r"(?:\." + _OCTET + r"){3})\b",
        "<IP>",
        True,
    ),
    # +CC (1-3 digits) then 8-12 digits in groups separated by
    # space/dot/dash — anchored on the leading '+' to stay precise
    "phone": (
        r"\+[0-9]{1,3}[ .-]?[0-9]{2,4}(?:[ .-]?[0-9]{2,4}){2,3}\b",
        "<PHONE>",
        False,
    ),
}

_ORDER = ("email", "ipv4", "phone")


def _apply(col: Column, kind: str) -> Column:
    pat, tok, grouped = PII_PATTERNS[kind]
    repl = f"$1{tok}" if grouped else tok
    return F.regexp_replace(col, pat, repl)


def redact_pii(text: Column, kinds: tuple[str, ...] = _ORDER) -> Column:
    """Replace each PII kind with its placeholder token, in the fixed
    safe order (module note)."""
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown pii kinds: {sorted(unknown)}")
    out = text
    for kind in _ORDER:
        if kind in kinds:
            out = _apply(out, kind)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (for corpus auditing dashboards) —
    counted on the PROGRESSIVELY redacted text so every PII span is
    attributed to exactly the kind that redacts it (module note)."""
    counts: dict[str, Column] = {}
    cur = text
    for kind in _ORDER:
        pat = PII_PATTERNS[kind][0]
        counts[kind] = F.regexp_count(cur, F.lit(pat))
        cur = _apply(cur, kind)
    return counts


def oracle_replacement(kind: str) -> str:
    """The DuckDB-side replacement string for q52's oracle (RE2 uses
    backslash group refs where Java uses $1)."""
    _, tok, grouped = PII_PATTERNS[kind]
    return f"\\1{tok}" if grouped else tok
