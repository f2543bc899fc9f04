"""Exact-substring span deduplication (the Lee et al. 2021
"Deduplicating Training Data Makes Language Models Better" move,
re-expressed relationally): any word k-gram that occurs more than
once corpus-wide marks its k-token span as duplicated text; every
occurrence EXCEPT the globally first one (by (doc_id, pos)) is
removed, so exactly one copy of each duplicated passage survives.
Overlapping flagged windows merge naturally — removal is a set union
of token positions, not an interval algebra.

The paper builds a suffix array over the concatenated corpus; a
suffix array is a single-machine data structure and the wrong shape
for a 10^12-doc table. The relational equivalent is three shuffles,
each with map-side partial aggregation:

  1. gram counts — groupBy(gram key) count over the posexploded
     k-gram stream (HashAggregate, map-side partials). With
     ``hash_grams=True`` the key is ``xxhash64(gram)`` — 8 bytes a
     gram instead of a k-word string, the same tradeoff as
     `decontaminate.py` (a 64-bit collision removes an innocent
     span; acceptable for a drop-filter, never used to keep text).
  2. flag join   — occurrences ⋈ duplicated-gram counts on the hash
     key; the join output is hash-partitioned by gram, so the
     winner aggregate (min(struct(doc_id,pos)) — sort-based, which
     is why it runs AFTER the count filter, over only the
     duplicated occurrences) and the winner join add no further
     exchange. The duplicated set is tiny vs the corpus gram
     stream; AQE's skew-join splits the hot grams that motivated
     this operator in the first place.
  3. reassembly  — flagged spans explode into token positions
     (k-fold amplification of FLAGGED spans only), distinct, and
     ONLY the affected documents pay tokenize + anti-join +
     collect_list rebuild (semi/anti routing against the affected-id
     set, which AQE broadcasts when small); untouched documents pass
     through without reassembly — at a realistic duplication rate the
     expensive object-aggregate sees a sliver of the corpus. Same
     row-preserving contract as `boilerplate.remove_boilerplate_lines`:
     a fully-duplicated doc stays a row with empty text.

Tokens are defined as single-space splits (the extract_text
contract); documents shorter than k tokens generate no grams and
are never touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontaminate import word_ngrams


def duplicated_gram_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """(id, pos, n_occurrences) for every NON-FIRST occurrence of a
    word k-gram that appears at least ``min_count`` times
    corpus-wide. ``pos`` is the 0-based start token index; the
    globally first occurrence (lexicographic (doc_id, pos)) is the
    kept copy and is NOT returned."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    occ = docs.select(
        F.col(id_col),
        F.posexplode(word_ngrams(F.col(text_col), k)).alias("pos", "gram"),
    )
    if hash_grams:
        occ = occ.select(id_col, "pos", F.xxhash64("gram").alias("g"))
    else:
        occ = occ.select(id_col, "pos", F.col("gram").alias("g"))
    # Count FIRST (plain count -> HashAggregate with map-side partials
    # over the full gram stream), and only then compute the winning
    # occurrence: min(struct) is a sort-based aggregate in Spark, so
    # it must see only the DUPLICATED occurrences (a small fraction of
    # a mostly-unique corpus gram stream), never the whole stream.
    counts = (
        occ.groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    # dup_occ comes out of this join hash-partitioned by g, so the
    # winner aggregate and the winner join below add NO new exchange.
    dup_occ = occ.join(counts, "g")
    winners = dup_occ.groupBy("g").agg(
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))
        ).alias("first")
    )
    return (
        dup_occ.join(winners, "g")
        .filter(
            ~(
                (F.col(id_col) == F.col("first.i"))
                & (F.col("pos") == F.col("first.p"))
            )
        )
        .select(id_col, "pos", "n_occurrences")
    )


def dedup_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    hash_grams: bool = True,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Remove every duplicated k-token span except its globally first
    occurrence; returns (id, *passthrough, text, n_tokens_kept,
    n_tokens_removed) with text rebuilt from surviving tokens in
    original order ('' when everything was duplicated — row
    preserved). ``passthrough`` columns ride the row-preserving side
    of the reassembly join (ids + metadata only — never the body)."""
    bad = set(passthrough) & {id_col, text_col}
    if bad:
        raise ValueError(f"passthrough collides with id/text cols: {bad}")
    flagged = duplicated_gram_positions(
        docs, id_col, text_col, k, min_count, hash_grams
    )
    removed = flagged.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("pos"),
    ).distinct()
    # `removed` feeds FOUR consumers (affected-id anti/semi routing,
    # the kept anti-join) and Catalyst clones the whole gram pipeline
    # per consumer — no ReusedExchange fires across the clones
    # (measured: 4x recompute of the two corpus-scale shuffles). A
    # lazy localCheckpoint collapses them to one RDD computed once;
    # its payload is only the flagged (id, pos) set.
    removed = removed.localCheckpoint(eager=False)
    # Only AFFECTED documents pay tokenize + anti-join + collect_list
    # reassembly; everything else passes through untouched. In a real
    # corpus the affected fraction is small, so the expensive
    # object-aggregate runs over a sliver of the table — and the
    # affected-ids set is exactly what AQE broadcasts for the
    # semi/anti routing joins when it is small.
    affected = removed.select(id_col).distinct()
    n_tokens = (
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
        .cast("bigint")
    )
    untouched = docs.join(affected, id_col, "left_anti").select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        n_tokens.alias("n_tokens_kept"),
        F.lit(0).cast("bigint").alias("n_tokens_removed"),
    )
    hit_docs = docs.join(affected, id_col, "left_semi")
    toks = hit_docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "pos", "tok"
        ),
    )
    kept = toks.join(removed, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("_text"),
    )
    repaired = (
        hit_docs.select(
            F.col(id_col),
            *[F.col(c) for c in passthrough],
            n_tokens.alias("_n_tokens"),
        )
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            *[F.col(c) for c in passthrough],
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_tokens_kept"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens_kept"),
            (F.col("_n_tokens") - F.coalesce(F.col("n_tokens_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_tokens_removed"),
        )
    )
    return untouched.unionByName(repaired)
