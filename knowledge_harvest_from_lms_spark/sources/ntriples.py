"""N-Triples source + sink — parse and serialize the W3C N-Triples
line format (the interchange format KGs ship in: Wikidata dumps,
DBpedia, any SPARQL endpoint's export).

The reference reads/writes its own JSON artifacts
(`sources/results_json.py` covers those); a KG-construction engine
additionally needs the standard graph wire format so harvested
triples interoperate. This module implements the canonical
N-Triples grammar subset used by real dumps: IRI refs
(``<...>``), blank nodes (``_:label``), and string literals with
the base escape set plus optional ``@lang`` / ``^^<datatype>``
suffixes.

Plan shapes — the scale decisions:

* The parser is a SINGLE JVM ``regexp_extract`` chain fused into the
  scan — zero shuffle, zero Python. One anchored regex splits the
  line into (subject, predicate, object) and a second pass
  classifies/unwraps the object term. A 10^12-line dump parses at
  scan speed with filters and column pruning pushed through it.
* Literal unescaping inside JVM expressions is made ORDER-CORRECT
  with the sentinel trick: ``\\\\`` (escaped backslash) is first
  swapped to an unused control character (NUL — impossible in
  N-Triples source, which must escape control characters), then the
  simple escapes (``\\"`` ``\\n`` ``\\t`` ``\\r``) are rewritten,
  then the sentinel becomes a real backslash. A naive replace chain
  corrupts ``\\\\n`` (backslash followed by 'n'); the sentinel
  chain cannot. The serializer applies the exact inverse in inverse
  order. ``\\uXXXX`` escapes pass through UNCHANGED (documented:
  dumps that use them round-trip byte-identically; decoding them
  needs a scalar loop better done at the consumer).
* Malformed lines never kill the job: they surface with
  ``valid = false`` and NULL term columns (plus the raw line), the
  reject-routing posture every corpus-scale source here uses
  (cf. `operators/extract_text.py`). Comments and blank lines are
  dropped — they are format framing, not data.

Engine parity: every transformation is a deterministic
regexp/replace chain DuckDB replays verbatim (RE2-compatible
patterns — no lookbehind, no backreferences), so the q118 oracle
checks the full parse including the escape chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Anchored triple splitter. Object term = IRI | blank | literal with
# optional @lang / ^^<datatype>. RE2-compatible (works in Spark's
# Java regex AND DuckDB's RE2 for the oracle).
_IRI = r"<[^>]*>"
_BLANK = r"_:[^\s]+"
_LIT = r'"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?'
TRIPLE_RE = (
    r"^[ \t]*(" + _IRI + r"|" + _BLANK + r")[ \t]+(" + _IRI + r")[ \t]+("
    + _IRI + r"|" + _BLANK + r"|" + _LIT + r")[ \t]*\.[ \t]*$"
)

_SENTINEL = "\x00"


def unescape_literal(col: Column) -> Column:
    """Decode N-Triples string-literal escapes (``\\\\`` ``\\"``
    ``\\n`` ``\\t`` ``\\r``) order-correctly via the sentinel trick.
    ``\\uXXXX`` passes through unchanged (see module docstring)."""
    c = F.replace(col, F.lit("\\\\"), F.lit(_SENTINEL))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    return F.replace(c, F.lit(_SENTINEL), F.lit("\\"))


def escape_literal(col: Column) -> Column:
    """Inverse of :func:`unescape_literal` — backslash FIRST, then
    the characters whose escapes introduce backslashes."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return F.replace(c, F.lit("\r"), F.lit("\\r"))


def _strip_iri(col: Column) -> Column:
    return F.substring(col, 2, F.length(col) - 2)


def parse_ntriples(
    lines: DataFrame, line_col: str = "line"
) -> DataFrame:
    """Parse a DataFrame of N-Triples lines.

    Returns one row per NON-framing input line (comments — first
    non-blank char ``#`` — and blank lines are dropped) with columns

    ``(line, valid, subj, subj_kind, pred, obj, obj_kind, lang,
    datatype)``

    where ``*_kind`` is ``iri`` / ``blank`` / ``literal``; IRIs are
    unwrapped from ``<>``; literal ``obj`` is the UNESCAPED lexical
    value with ``lang`` / ``datatype`` split out (datatype IRI
    unwrapped). Malformed lines keep the raw ``line``, get
    ``valid = false`` and NULL terms."""
    raw = lines.select(F.col(line_col).alias("line")).filter(
        ~F.col("line").rlike(r"^[ \t]*(#.*)?$")
    )
    s = F.regexp_extract("line", TRIPLE_RE, 1)
    p = F.regexp_extract("line", TRIPLE_RE, 2)
    o = F.regexp_extract("line", TRIPLE_RE, 3)
    valid = s != F.lit("")
    kind = lambda c: (  # noqa: E731 — tiny shared classifier
        F.when(c.startswith("<"), F.lit("iri"))
        .when(c.startswith("_:"), F.lit("blank"))
        .otherwise(F.lit("literal"))
    )
    # literal body + suffixes: the closing quote is the LAST '"'
    # because @lang / ^^<dt> cannot contain one.
    lit_body = F.regexp_extract(o, r'^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.regexp_extract(o, r'"@([A-Za-z][A-Za-z0-9-]*)$', 1)
    dtype = F.regexp_extract(o, r'"\^\^<([^>]*)>$', 1)
    obj_kind = kind(o)
    return raw.select(
        "line",
        valid.alias("valid"),
        F.when(~valid, None)
        .when(s.startswith("<"), _strip_iri(s))
        .otherwise(s)
        .alias("subj"),
        F.when(~valid, None).otherwise(kind(s)).alias("subj_kind"),
        F.when(~valid, None).otherwise(_strip_iri(p)).alias("pred"),
        F.when(~valid, None)
        .when(obj_kind == "iri", _strip_iri(o))
        .when(obj_kind == "blank", o)
        .otherwise(unescape_literal(lit_body))
        .alias("obj"),
        F.when(~valid, None).otherwise(obj_kind).alias("obj_kind"),
        F.when(~valid | (lang == ""), None).otherwise(lang).alias("lang"),
        F.when(~valid | (dtype == ""), None)
        .otherwise(dtype)
        .alias("datatype"),
    )


def to_ntriples(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    obj_kind_col: str | None = "obj_kind",
    lang_col: str | None = "lang",
    datatype_col: str | None = "datatype",
) -> DataFrame:
    """Serialize triples to canonical N-Triples ``line`` strings.

    ``subj`` values starting with ``_:`` emit as blank nodes, all
    others wrap as IRIs. Objects follow ``obj_kind`` (default
    ``iri`` when the column is absent/NULL); literals re-escape via
    :func:`escape_literal` and re-attach ``@lang`` / ``^^<dt>``.
    Round-trips :func:`parse_ntriples` byte-exactly for the
    supported grammar (pinned in tests)."""
    cols = triples.columns
    s = F.col(subj_col)
    s_term = F.when(s.startswith("_:"), s).otherwise(
        F.concat(F.lit("<"), s, F.lit(">"))
    )
    p_term = F.concat(F.lit("<"), F.col(pred_col), F.lit(">"))
    o = F.col(obj_col)
    okind = (
        F.coalesce(F.col(obj_kind_col), F.lit("iri"))
        if obj_kind_col and obj_kind_col in cols
        else F.lit("iri")
    )
    lang = (
        F.col(lang_col)
        if lang_col and lang_col in cols
        else F.lit(None).cast("string")
    )
    dtype = (
        F.col(datatype_col)
        if datatype_col and datatype_col in cols
        else F.lit(None).cast("string")
    )
    lit = F.concat(
        F.lit('"'),
        escape_literal(o),
        F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang))
        .when(dtype.isNotNull(), F.concat(F.lit("^^<"), dtype, F.lit(">")))
        .otherwise(F.lit("")),
    )
    o_term = (
        F.when(okind == "blank", o)
        .when(okind == "literal", lit)
        .otherwise(F.concat(F.lit("<"), o, F.lit(">")))
    )
    return triples.select(
        F.concat_ws(" ", s_term, p_term, o_term, F.lit(".")).alias("line")
    )
