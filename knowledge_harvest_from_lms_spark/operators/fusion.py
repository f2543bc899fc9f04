"""Reciprocal-rank fusion of heterogeneous retrieval rankings.

Hybrid retrieval — a lexical ranker (BM25, operators/bm25.py) fused
with a dense/similarity ranker (cosine ANN, operators/simsearch.py;
or the n-gram Jaccard ranker below) — is the standard recall move
for targeted corpus slicing: each ranker misses documents the other
finds, and RRF (Cormack, Clarke & Buettcher, SIGIR 2009) combines
them without any score calibration:

    rrf(d) = Σ_r 1 / (k + rank_r(d))        (k = 60 in the paper)

Only RANKS cross the fusion boundary, so BM25's unbounded scores and
cosine's [-1, 1] never need normalizing against each other — the
reason RRF beats score-averaging on uncalibrated ranker pairs.

Plan shape: each ranking is already a top-N (bounded — TakeOrdered
or rank-filtered upstream), so the union is at most |rankers| * N
rows; one hash aggregate on doc id produces the fused scores and the
final top-n is a TakeOrderedAndProject. Nothing corpus-sized moves
through the fusion itself — the rankers own their corpus passes.
Published scores round at 9 and ranks tie-break on the id — the
repo-wide shuffle-order determinism rule (README determinism note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k: int = 60,
    top_n: int = 100,
) -> DataFrame:
    """Fuse ranked lists into ``(id_col, rrf double, n_rankers int,
    rnk int)`` — rrf rounded at 9, ranked desc with the id as
    tie-break, truncated to ``top_n``. Each input needs ``id_col``
    plus an integer 1-based ``rank_col``; a document absent from a
    ranking simply contributes nothing for it (the standard RRF
    convention for unreturned documents)."""
    if not rankings:
        raise ValueError("need at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = [
        r.select(
            F.col(id_col),
            (
                F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))
            ).alias("_contrib"),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy(id_col).agg(
        F.round(F.sum("_contrib"), 9).alias("rrf"),
        F.count(F.lit(1)).cast("int").alias("n_rankers"),
    )
    w = W.orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select(id_col, "rrf", "n_rankers", "rnk")
    )


def char_grams(col: Column, n: int = 3, head: int = 120) -> Column:
    """Distinct char n-gram set of ``col``'s first ``head`` chars —
    the q73 gram convention, shared so fusion rankers and the setsim
    joins agree on what "similar" means."""
    h = F.substring(col, 1, head)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(h) - (n - 1)),
            lambda i: h.substr(i, F.lit(n)),
        )
    )
    # sequence(1, x) with x < 1 DESCENDS ([1, 0]) instead of being
    # empty — guard texts shorter than n explicitly.
    return F.when(F.length(h) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def jaccard_rank(
    docs: DataFrame,
    query: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    head: int = 120,
    top_n: int = 100,
) -> DataFrame:
    """Char n-gram Jaccard ranker — the similarity twin for hybrid
    fusion when no embedding column exists: each document's distinct
    char n-gram set (q73 convention, first ``head`` chars) scored
    against the QUERY's gram set. Returns ``(doc_id, jac double,
    rnk int)``, jac rounded at 9, rank tie-broken on doc id;
    zero-overlap documents are omitted (their rank is undefined).

    The query-side gram set is a LITERAL array (a query is a few
    dozen grams), so the per-document score is one codegen'd
    array_intersect against a constant — no join, no shuffle before
    the final bounded top-n."""
    qgrams = sorted(
        {query[i : i + n] for i in range(max(len(query) - n + 1, 0))}
    )
    if not qgrams:
        raise ValueError(f"query shorter than n={n}: {query!r}")
    qlit = F.array(*[F.lit(g) for g in qgrams])
    g = char_grams(F.col(text_col), n=n, head=head)
    inter = F.size(F.array_intersect(g, qlit))
    jac = inter.cast("double") / (
        F.size(g) + F.lit(len(qgrams)) - inter
    )
    scored = (
        docs.select(
            F.col(doc_id_col), F.round(jac, 9).alias("jac")
        )
        .filter(F.col("jac") > 0)
    )
    # top-n FIRST (distributed TakeOrderedAndProject over the corpus),
    # THEN rank the n survivors — never a global window on raw docs.
    top = scored.orderBy(F.desc("jac"), F.asc(doc_id_col)).limit(top_n)
    w = W.orderBy(F.desc("jac"), F.asc(doc_id_col))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        doc_id_col, "jac", "rnk"
    )
