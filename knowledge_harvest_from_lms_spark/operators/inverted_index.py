"""Inverted-index materialization: term → postings with positions.

The lexical-retrieval companion to ``operators/bm25.py`` (which
scores against a LITERAL query vocabulary and never materializes an
index): this builds the index itself, the thing a corpus-curation
stack persists so repeated slicing queries (benchmark topic pulls,
contrast-set mining, phrase lookups via positions) stop re-scanning
20 TB of text.

Two output shapes:

* ``inverted_postings`` — FLAT rows ``(term, doc_id, tf,
  positions)``: one row per (term, doc), positions as a sorted
  int array. This is the scale-safe on-disk layout — a stopword's
  postings are millions of ROWS (bucketed/sorted by term via
  ``operators/bucketing.py`` for exchange-free lookups), never one
  million-element aggregate in a single group.
* ``posting_shards`` — grouped rows ``(term, shard, postings
  array<struct>)`` for engines that want list-shaped postings: the
  shard key ``doc_id % n_shards`` bounds every collect_list to
  ~df/n_shards entries, so a hot term cannot OOM one reducer. The
  union of a term's shards is exactly its posting list (order by
  doc_id within shard; shards are disjoint by construction).

df (document frequency) rides along via one (term) aggregate joined
back on the term key — a plain shuffle join (the vocabulary is far
too big to broadcast at corpus scale; hot-term probe skew is AQE
skew-split material since the build side is one row per term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import _tokens


def inverted_postings(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Flat postings ``(term, doc_id, tf, positions array<int>, df)``
    using the repo's portable tokenizer (lowercase, split on
    non-alphanumeric runs). ``min_df`` drops the long hapax tail
    (most of the vocabulary, typically junk) AFTER df is computed, so
    surviving df values are still corpus-true."""
    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "term"),
    )
    per_doc = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    df_tbl = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    out = per_doc.join(df_tbl, "term")
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out.select("term", "doc_id", "tf", "positions", "df")


def posting_shards(
    postings: DataFrame, n_shards: int = 64
) -> DataFrame:
    """Group flat postings into ``(term, shard, df, postings)`` where
    ``shard = doc_id % n_shards`` and ``postings`` is an array of
    ``(doc_id, tf, positions)`` structs sorted by doc_id. Every
    aggregate group is bounded by ~df/n_shards entries."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return (
        postings.withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(n_shards))
        )
        .groupBy("term", "shard")
        .agg(
            F.first("df").alias("df"),
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "positions"))
            ).alias("postings"),
        )
    )
