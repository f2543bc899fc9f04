"""Distributed BPE tokenizer training — the missing first step of a
training-data pipeline (every real pipeline trains its tokenizer on
the corpus it just curated).

Exact-parity contract: given the same texts, the learned merge table
is IDENTICAL, element for element, to the repo's in-process trainer
(`lm/fake_tokenizers._train_bpe` — standard BPE with lexical
tie-breaks; tests/test_bpe_trainer.py pins list equality). That
trainer is single-machine; this one has the shape industrial trainers
(HF tokenizers, SentencePiece) use at scale, made relational:

  * corpus-scale work happens ONCE: `pretoken_counts` is a single
    groupBy over the GPT-2-pretokenized stream (JVM regexp in the
    scan projection, map-side partials absorb Zipf head words).
  * every merge iteration then runs over the DISTINCT-pretoken table
    — vocab-bounded (10^6–10^7 rows at web scale), NOT corpus-bounded:
    one adjacent-pair explode + count aggregate, a 1-row argmax
    collect (count desc, pair lexical asc — UTF-8 binary order equals
    code-point order, matching Python tuple comparison), and one
    left-to-right pair-fusion rewrite expressed as an F.aggregate
    state machine (pure JVM — no Python crossing anywhere).
  * plan depth stays O(1) per iteration via eager localCheckpoint,
    the same discipline as `graph.pagerank`; driver state is one
    (pair, count) row per merge.

ASCII caveat (documented, matches the parity target): Java's \\s in
the whitespace filter covers [ \\t\\n\\x0B\\f\\r] while Python's
str.isspace() also accepts exotic unicode spaces — identical on the
ASCII corpora both trainers pretokenize with `_GPT2_SPLIT`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# keep in sync with lm/fake_tokenizers._GPT2_SPLIT (the parity target)
GPT2_SPLIT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
_G = "Ġ"  # Ġ — GPT-2 space marker


def pretoken_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(pretoken, c) over the GPT-2 pre-tokenization of the corpus —
    the one corpus-scale aggregate; everything after is vocab-bounded."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(GPT2_SPLIT), 0)
            ).alias("pretoken")
        )
        .filter(~F.col("pretoken").rlike(r"^\s+$"))
        .groupBy("pretoken")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def _initial_syms(pretoken: Column) -> Column:
    """Char symbols; a leading space becomes the standalone Ġ symbol
    (fake_tokenizers._initial_syms)."""
    return F.when(
        pretoken.startswith(" "),
        F.concat(
            F.array(F.lit(_G)), F.split(F.substring(pretoken, 2, 1 << 30), "")
        ),
    ).otherwise(F.split(pretoken, ""))


def _fuse_pair(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with a+b — an F.aggregate state machine carrying (out, pending,
    has_pending), byte-equal to the reference trainer's scan loop
    (a fused symbol never re-participates in the same round)."""
    fused = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit("").alias("pend"),
        F.lit(False).alias("has"),
    )

    def step(acc: Column, x: Column) -> Column:
        take = acc["has"] & (acc["pend"] == F.lit(a)) & (x == F.lit(b))
        flushed = F.when(
            acc["has"], F.concat(acc["out"], F.array(acc["pend"]))
        ).otherwise(acc["out"])
        return F.struct(
            F.when(take, F.concat(acc["out"], F.array(F.lit(fused))))
            .otherwise(flushed)
            .alias("out"),
            F.when(take, F.lit("")).otherwise(x).alias("pend"),
            (~take).alias("has"),
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc["has"], F.concat(acc["out"], F.array(acc["pend"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, init, step, finish)


def train_bpe_distributed(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge table (identical to
    ``lm.fake_tokenizers._train_bpe`` on the same texts). Stops early
    when no adjacent pair remains."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    state = (
        pretoken_counts(docs, text_col)
        .select(_initial_syms(F.col("pretoken")).alias("syms"), "c")
        .groupBy("syms")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        best = (
            state.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
                "c",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        state = (
            state.select(_fuse_pair(F.col("syms"), a, b).alias("syms"), "c")
            .groupBy("syms")
            .agg(F.sum("c").alias("c"))
        )
        if (it + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
    return merges
