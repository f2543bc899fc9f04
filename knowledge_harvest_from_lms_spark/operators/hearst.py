"""Hearst-pattern IsA extraction — corpus-grounded hypernym triples.

The oldest and still most load-bearing web-KG construction signal
(Hearst 1992; used at scale by WebIsA/PATTY and as the IsA backbone of
Probase/ConceptNet-style graphs): lexico-syntactic patterns like
"fruits such as apples and oranges" yield (apple, IsA, fruit) triples
directly from raw text, no model in the loop. In this engine it is the
corpus-grounded complement to the MLM beam harvest
(`operators/beam_search.py`, reference `knowledge_harvest/lm.py` —
the reference mines triples ONLY from the LM; a web-scale deployment
wants both sources feeding the same graph so the grounding join
`operators/corpus_grounding.py` can cross-validate them).

Supported patterns (lowercased sentence stream, single-token NPs —
the chunker-free simplification; a production system swaps the token
class for an NP chunk without touching the dataflow):

  * ``HYPER such as X, Y(,)? and Z``      -> (X|Y|Z, IsA, HYPER)
  * ``HYPER including X, Y(,)? and Z``    -> same
  * ``HYPER especially X, Y(,)? and Z``   -> same
  * ``X, Y(,)? and other HYPER``          -> (X|Y, IsA, HYPER)
  * ``X is|was|are|were a|an HYPER``      -> (X, IsA, HYPER) (copula)
  * ``X, a|an HYPER,``                    -> (X, IsA, HYPER)
    (appositive; the trailing comma is required — it is what
    separates an apposition from an ordinary article object)

The copula/appositive subject slot is stopword-rich on raw web text
("this is a ..."); compose `functions.textops.stopword filters` (F4)
downstream exactly as the reference pipeline does for MLM-harvested
entities — this operator's contract is recall + determinism, not
precision.

Plan shape — the scale decisions:

* ONE projection computes every pattern's ``regexp_extract_all`` over
  the same text scan (arrays in one row), so the corpus is read once;
  the per-pattern arrays explode into a single match stream.
  Extraction is pure JVM regex — no Python in the hot path.
* List splitting (``, `` / `` and ``) is ``F.split`` + one more
  explode — per-row array ops; rows amplify only by actual match
  count (a few per page), never by corpus size.
* The output aggregate ``(hypo, hyper, pattern) -> n`` collapses
  map-side (Zipf-headed hypernyms like "company"/"city" are absorbed
  by partial aggregation — no window over the hot hypernym key).
* Singular/plural is NOT normalized here (exactness-first contract;
  a lemmatizer stage can follow). A trailing ``s`` strip option would
  break hash-replay for words like "gas".

The regexes avoid lookaround and anchors so Java (Spark) and RE2
(DuckDB oracle, q102) compile the identical automaton; the oracle
replays extraction + list split + aggregation hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One word token = the NP stand-in. Shared with the oracle SQL.
_W = "[a-z][a-z0-9_-]*"
# A list of 1..n tokens glued by ", " / " and " / ", and ". ONE repeat
# with the glue alternation ordered ", and " FIRST: a two-branch
# grammar ("(, w)* (and w)?") lets the greedy repeat capture the
# Oxford comma's "and" as a list item and then truncate the match —
# verified divergence, hence this shape. Leftmost-first alternation
# behaves identically in Java (backtracking) and RE2 (simulation),
# and neither branch needs lookaround (RE2 has none).
_LIST = f"{_W}(?:(?:, and |, | and ){_W})*"
# Split glue for recovering items from a matched list; same
# leftmost-first ordering trick (",? and " covers ", and "/" and ").
LIST_SPLIT = ",? and |, "

# pattern name -> (regex, hyper_group, list_group)
# Group numbering is per-regex; every inner group is non-capturing so
# the two capture groups are stable and the SQL replay can cite them.
PATTERNS: dict[str, tuple[str, int, int]] = {
    "such_as": (f"({_W}) such as ({_LIST})", 1, 2),
    "including": (f"({_W}) including ({_LIST})", 1, 2),
    "especially": (f"({_W}) especially ({_LIST})", 1, 2),
    "and_other": (f"({_W}(?:, {_W})*),? and other ({_W})", 2, 1),
    # Copula/appositive: the "list" side is the single subject token
    # (a 1-item _LIST), so the shared split/explode machinery applies
    # unchanged. Non-overlapping leftmost scan is identical in Java
    # and RE2, so chained copulas ("x is a y is a z") extract the
    # same single match in both engines.
    "copula_isa": (f"({_W}) (?:is|was|are|were) (?:a|an) ({_W})", 2, 1),
    "appositive_isa": (f"({_W}), (?:a|an) ({_W}),", 2, 1),
}


def hearst_matches(
    docs: DataFrame, text_col: str = "text", keep: tuple = ()
) -> DataFrame:
    """The raw match stream: one row per (pattern, hyper, hypo_list)
    occurrence — ``(pattern, hyper, hypos)`` with ``hypos`` still the
    joined list string. Kept separate from the aggregate so lineage
    checkpoints (`operators/checkpoint.py`) can persist the stream
    once and derive both the triple counts and per-page provenance;
    ``keep`` names doc columns to carry through per match (url,
    warc_ts, ...) — that provenance feeds `temporal_scope` and
    per-source truth finding in jobs/run_corpus_kg.py."""
    low = F.lower(F.col(text_col))
    # One scan: every pattern extracted in the same projection.
    cols = [F.col(c) for c in keep]
    for name, (rx, hg, lg) in PATTERNS.items():
        hyper = F.regexp_extract_all(low, F.lit(rx), hg)
        hypos = F.regexp_extract_all(low, F.lit(rx), lg)
        cols.append(
            F.transform(
                F.arrays_zip(hyper, hypos),
                lambda z: F.struct(
                    F.lit(name).alias("pattern"),
                    z["0"].alias("hyper"),
                    z["1"].alias("hypos"),
                ),
            ).alias(name)
        )
    matched = docs.select(*cols)
    stream = matched.select(
        *keep,
        F.explode(
            F.flatten(F.array(*[F.col(n) for n in PATTERNS]))
        ).alias("m"),
    )
    return stream.select(*keep, "m.pattern", "m.hyper", "m.hypos")


def hearst_isa_sightings(
    docs: DataFrame, text_col: str = "text", keep: tuple = ()
) -> DataFrame:
    """One row per (hypo, hyper, pattern) SIGHTING, with ``keep``
    provenance columns carried through — the pre-aggregation stream
    `hearst_isa` counts, exposed so `operators/kg_refine.py`'s
    temporal_scope / truth_finding can consume per-page evidence
    (url, warc_ts) without a second corpus scan."""
    m = hearst_matches(docs, text_col, keep=keep)
    return m.select(
        *keep,
        "pattern",
        "hyper",
        F.explode(
            F.filter(
                F.split(F.col("hypos"), LIST_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("hypo"),
    ).filter(F.col("hypo") != F.col("hyper"))


def hearst_isa(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """IsA triples with support: ``(hypo, hyper, pattern, n)``,
    ``n >= min_count``. ``hypo`` is each element of the matched list
    after splitting on ``", "`` / ``",? and "``; self-pairs
    (hypo == hyper, e.g. from "other other") are dropped, matching
    the reference pipeline's intra-tuple dup filter
    (`knowledge_harvest/utils.py` F7)."""
    hypo = hearst_isa_sightings(docs, text_col)
    out = (
        hypo.groupBy("hypo", "hyper", "pattern")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def hearst_siblings(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Coordinate-term (co-hyponym) pairs: items that appear in the
    SAME matched list share a class — "fruits such as apples, pears
    and plums" yields (apples, pears), (apples, plums),
    (pears, plums). The classic distributional-siblings signal
    (Hearst 1992 §4; used for taxonomy densification and as
    same-class evidence for entity canonicalization —
    `operators/graph.py`'s LSH clustering is string-similarity-based,
    this is MEANING-based and catches synonyms strings can't).

    Output ``(a, b, pattern, n)`` with ``a < b`` lexicographically
    (undirected pairs, one canonical orientation) and ``n >=
    min_count`` co-list occurrences. Pair generation is row-local
    (nested ``transform`` over the split array — lists are a few
    items, so the quadratic is bounded by grammar, not data); the
    count collapses map-side like `hearst_isa`'s. Copula/appositive
    matches have 1-item lists and contribute nothing, by
    construction."""
    m = hearst_matches(docs, text_col)
    items = F.filter(
        F.split(F.col("hypos"), LIST_SPLIT), lambda t: t != F.lit("")
    )
    pairs = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                # elements after 0-based position i (slice is 1-based)
                F.slice(items, i + 2, F.size(items)),
                lambda y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            ),
        )
    )
    out = (
        m.select("pattern", F.explode(pairs).alias("p"))
        .select("pattern", "p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b", "pattern")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def as_graph_triples(isa: DataFrame) -> DataFrame:
    """Adapt ``hearst_isa`` output to the engine's harvested-triple
    shape ``(rel, ents, weight)`` consumed by
    `operators.graph.materialize_graph` / `merge_into_graph`, so
    corpus-mined IsA edges land in the SAME vertex/edge graph as the
    MLM beam harvest (weight = pattern support count)."""
    return isa.select(
        F.lit("isa").alias("rel"),
        F.array("hypo", "hyper").alias("ents"),
        F.col("n").cast("double").alias("weight"),
    )
