"""ReVerb-style Open IE — (subj, pred, obj) triples from raw text.

The corpus-side complement to the MLM harvest for ARBITRARY
predicates: where `operators/hearst.py` mines the fixed IsA relation
and the reference mines only through the LM
(`knowledge_harvest/lm.py` emits tuples for a *given* relation
prompt), open information extraction surfaces the relation phrase
itself from the sentence — the move of ReVerb (Fader et al. 2011) and
the OLLIE/Stanford-OpenIE line — so a web-scale deployment can seed
NEW relation definitions for the MLM pipeline from what the corpus
actually says.

Chunker-free contract (single-token NPs, closed verb/preposition
lexicons instead of a POS tagger — a production system swaps a real
tagger into the same dataflow):

  * sentences = text split on ``[.!?]``, lowercased;
  * a candidate fires at verb position ``i`` when ``tokens[i] in
    verbs`` and ``tokens[i-1]`` (the subject) is in NEITHER lexicon;
  * the relation phrase is the verb plus the maximal run of
    following preposition/particle tokens, bounded by
    ``max_prep_run`` (ReVerb's ``V P*`` shape without the middle
    ``W*`` — the unbounded-noun middle needs a tagger to end
    non-arbitrarily, so it is out of contract);
  * the object is the first non-preposition token after the run; a
    run that exceeds the bound or hits the sentence end yields
    nothing; subj == obj candidates are dropped (the reference's F7
    intra-tuple dup filter, `knowledge_harvest/utils.py`).

Plan shape — the scale decisions:

* Tokenization, candidate generation, and the bounded prep-run
  resolution are ALL higher-order JVM Column functions
  (`split`/`filter`/`transform`/`get` over per-sentence arrays) —
  no Python anywhere, no shuffle until the final count.
* Rows amplify by sentences per doc and then by actual candidate
  count — never by token pairs (the positional SELF-JOIN formulation
  the DuckDB oracle q103 uses would shuffle the token stream three
  times at corpus scale; here position lookups are row-local
  `F.get` calls, which is the point of keeping the token array
  together).
* The (subj, pred, obj) count collapses map-side (partial
  HashAggregate below the one Exchange) so Zipf-headed predicates
  ("is", "has") are absorbed per partition.
* Lexicons compile to IN-list predicates (codegen'd) — right for
  closed function-word sets. A corpus-derived verb lexicon of 10^5+
  entries would swap the IN predicate for a broadcast semi-join on
  the verb token without touching the rest of the dataflow.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Chunk-extraction twins of sentence/token SPLITTING. Why extraction:
# Spark's `split` goes through UTF8String.split -> String.split,
# which COMPILES the regex per row — measured as the dominant cost
# AND a thread-scaling killer (Pattern.compile's allocation storm
# contends on the shared young gen: local[2]->local[8] efficiency
# 0.27 with split, ~0.9 with extraction; stack-sampled
# `Pattern.compile <- String.split <- UTF8String.split`).
# RegExpExtractAll caches the compiled pattern (lastRegex), and
# extracting maximal delimiter-free runs yields exactly the split
# pieces minus empty strings — which the token pipeline filtered
# anyway (empty sentences contribute no tokens).
SENT_CHUNK = "[^.!?]+"
TOKEN_CHUNK = "[a-z0-9_-]+"


def open_ie(
    docs: DataFrame,
    verbs: Iterable[str],
    preps: Iterable[str],
    text_col: str = "text",
    max_prep_run: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """Triples with support: ``(subj, pred, obj, n)``, ``n >=
    min_count``. ``pred`` is the space-joined relation phrase
    (verb + 0..max_prep_run prepositions)."""
    verbs = sorted(set(verbs))
    preps = sorted(set(preps))
    lex = sorted(set(verbs) | set(preps))

    sents = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(SENT_CHUNK), 0
            )
        ).alias("s")
    )
    toks = sents.select(
        F.regexp_extract_all(F.col("s"), F.lit(TOKEN_CHUNK), 0).alias("t")
    ).filter(F.size("t") >= 3)

    t = F.col("t")

    def cand(i: Column) -> Column:
        # i = 0-based verb position (pre-filtered); F.get returns
        # null out of bounds, which fails every branch cleanly.
        subj = F.get(t, i - 1)
        verb = F.get(t, i)
        c = None
        for k in range(max_prep_run + 1):
            # fall-through from branch k-1 implies tokens
            # i+1..i+k are all prepositions (a null would have
            # nulled that branch's obj too, ending the chain).
            obj = F.get(t, i + 1 + k)
            pred = F.concat_ws(
                " ", verb, *[F.get(t, i + 1 + j) for j in range(k)]
            )
            hit = obj.isNotNull() & ~obj.isin(*preps)
            out = F.struct(
                subj.alias("subj"), pred.alias("pred"), obj.alias("obj")
            )
            c = F.when(hit, out) if c is None else c.when(hit, out)
        return F.when(~subj.isin(*lex), c)

    # verb positions FIRST (one cheap IN probe per token), candidate
    # structs + when-ladders only at actual verb hits — on web text
    # hits are a few per thousand tokens, so this removes ~99% of the
    # interpreted-HOF struct allocation (measured: the residual
    # local[2]->local[8] CPU inflation of the miner came from exactly
    # that allocation volume).
    verb_pos = F.filter(
        F.sequence(F.lit(1), F.size(t) - 2),
        lambda i: F.get(t, i).isin(*verbs),
    )
    cands = toks.select(
        F.explode(
            F.filter(
                F.transform(verb_pos, cand),
                lambda c: c.isNotNull(),
            )
        ).alias("c")
    )
    out = (
        cands.select("c.subj", "c.pred", "c.obj")
        .filter(F.col("subj") != F.col("obj"))
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def as_graph_triples(triples: DataFrame) -> DataFrame:
    """Adapt ``open_ie`` output to the engine's harvested-triple shape
    ``(rel, ents, weight)`` consumed by
    `operators.graph.materialize_graph` / `merge_into_graph` — the
    mined relation phrase becomes the edge relation, so corpus-mined
    predicates land in the SAME graph as the MLM harvest's relation
    set (weight = support count)."""
    return triples.select(
        F.col("pred").alias("rel"),
        F.array("subj", "obj").alias("ents"),
        F.col("n").cast("double").alias("weight"),
    )
