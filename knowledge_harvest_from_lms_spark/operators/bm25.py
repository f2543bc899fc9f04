"""BM25 ranked retrieval over a document table, fully relational.

Training-data pipelines use BM25 for targeted corpus slicing (pull
documents matching a benchmark's topic terms, build contrast sets for
classifiers, seed DSIR's target distribution — see operators/dsir.py)
and for the lexical half of hybrid search next to the ANN operators
(operators/simsearch.py). Okapi BM25 (Robertson & Walker 1994; the
formula below is the standard Lucene/ATIRE variant with the +1-free
log idf floored at 0 via ln(1 + ·)):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Plan shape — the scale decisions:

* **Document length never shuffles.** Each document is one row, so
  ``dl = size(tokens)`` is a per-row projection and ``avgdl``/``N``
  one scalar aggregate — not the groupBy-per-token a posting-list
  port would do.
* **Only query-term postings shuffle.** Tokens are filtered to the
  query vocabulary (array_intersect against a literal — codegen'd,
  pushdown-friendly) BEFORE the explode + (doc, term) aggregate, so
  the shuffle carries |docs containing a query term| · |query terms|
  rows, not the corpus's full token stream.
* **df and scoring stay on that filtered frame**; the final ranking
  is a top-k (TakeOrderedAndProject when collected with a limit).

Scores are published rounded (round 9) so shuffle-order float
summation can't wobble a rank near a tie — the repo-wide determinism
rule (see README determinism note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# portable tokenizer convention shared with the DuckDB oracles:
# lowercase, maximal alphanumeric runs (== split on non-alnum runs
# minus empties). Extraction with a cached compiled pattern, not
# split-and-filter: Spark's `split` recompiles its regex per row —
# the openie.py finding.
_TOKEN_EXTRACT = "[a-z0-9]+"


def _tokens(text):
    return F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_EXTRACT), 0)


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (documents with no
    query term are omitted — their score is exactly 0). Returns
    ``(doc_id, score double, n_terms_hit long)``, score rounded at 9.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = sorted({t.lower() for t in query_terms})
    qlit = F.array(*[F.lit(t) for t in q])

    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        _tokens(F.col(text_col)).alias("toks"),
    )
    lens = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avgdl")
    )

    # array_intersect dedups, so the explode yields each matched
    # query term ONCE per doc; the true tf is then a JVM HOF count
    # against the original token array (no full-token explode)
    tf = (
        toks.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.col("toks"),
            F.explode(F.array_intersect("toks", qlit)).alias("qterm"),
        )
        .withColumn(
            "tf",
            F.size(F.filter("toks", lambda t: t == F.col("qterm"))).cast(
                "double"
            ),
        )
        .drop("toks")
    )
    df_t = tf.groupBy("qterm").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "qterm")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log1p(
                (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("part"), 9).alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
