"""Similarity search over embedding columns: brute-force cosine top-k
(baseline, exact) and an LSH-bucketed approximate variant (scale path).

At 100TB the broadcast side is the *query* set (small); the corpus
side streams through a single pass. Brute force is exact and
shuffle-free (broadcast queries → per-partition scoring → global
top-k via TakeOrderedAndProject per query). The LSH variant trades
recall for touching only matching hyperplane buckets.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import plane_signature


def _cos(ea, eb):
    dot = F.aggregate(
        F.zip_with(ea, eb, lambda x, y: (x * y).cast("double")),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(F.transform(ea, lambda x: (x * x).cast("double")),
                            F.lit(0.0).cast("double"), lambda a, x: a + x))
    nb = F.sqrt(F.aggregate(F.transform(eb, lambda x: (x * x).cast("double")),
                            F.lit(0.0).cast("double"), lambda a, x: a + x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (broadcast queries)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("qe")
    )
    c = corpus.select(F.col(id_col).alias("item_id"), F.col(emb_col).alias("ce"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("item_id"))
        .withColumn("cos", F.round(_cos(F.col("qe"), F.col("ce")), 6))
        .select("query_id", "item_id", "cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("item_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", emb_col: str = "embedding",
    dim: int = 64, n_planes: int = 4, n_tables: int = 8, seed: int = 42,
) -> DataFrame:
    """Approximate top-k: n_tables independent hyperplane bucketings;
    score only bucket-collision pairs, union tables, dedup, rank."""
    rng = np.random.Generator(np.random.PCG64(seed))
    per_table = []
    for t in range(n_tables):
        planes = rng.standard_normal((n_planes, dim))
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("qe")
        ).withColumn("bucket", plane_signature(F.col("qe"), planes))
        c = corpus.select(
            F.col(id_col).alias("item_id"), F.col(emb_col).alias("ce")
        ).withColumn("bucket", plane_signature(F.col("ce"), planes))
        per_table.append(
            F.broadcast(q).join(c, "bucket").filter(
                F.col("query_id") != F.col("item_id")
            ).select("query_id", "item_id", "qe", "ce")
        )
    cand = per_table[0]
    for p in per_table[1:]:
        cand = cand.unionByName(p)
    cand = cand.dropDuplicates(["query_id", "item_id"])
    scored = cand.withColumn("cos", F.round(_cos(F.col("qe"), F.col("ce")), 6)).select(
        "query_id", "item_id", "cos"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("item_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
