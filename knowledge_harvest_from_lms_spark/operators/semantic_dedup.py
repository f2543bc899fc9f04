"""SemDeDup-style semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The move that makes embedding dedup tractable at 10^9 documents:
instead of an all-pairs (or LSH-bucketed) cosine search, FIRST
partition the corpus into k semantic clusters, THEN compare pairs
only within a cluster — the candidate volume drops from N^2 to
~N^2/k, and each cluster is an independent shard.

Pipeline (all DataFrame ops):
  1. centroids — either caller-supplied, or the deterministic
     default: the embeddings of the k smallest ids (a fixed,
     engine-replayable seeding; production callers can pass centroids
     from `simsearch.ivf_topk`'s k-means fit for tighter clusters —
     cluster QUALITY affects recall, not correctness, exactly as in
     the paper where k is "chosen for tractability").
  2. assign — broadcast the k centroids, argmax cosine per row
     (ties -> lowest centroid id). One map-side pass, no shuffle.
  3. intra-cluster pairs — self-join on cluster id with id< id' and
     the cosine threshold INSIDE the join condition; a row is a
     duplicate iff SOME earlier same-cluster row sits within tau.
     "Earlier id survives" replaces the paper's keep-farthest-from-
     centroid tiebreak with an order-free deterministic rule (the
     paper itself notes the choice of survivor is near-arbitrary:
     random / farthest performed identically).

Scale notes: step 3's shuffle key is the cluster id; cluster skew is
real (webtext clumps) — `max_cluster_frac` documents the guard knob:
oversized clusters should be re-split by a second-level assignment
(recursive call with centroids drawn inside the cluster) rather than
salted, because correctness only needs WITHIN-cluster comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _cos(ea, eb):
    """Cosine with elements cast to double BEFORE the multiply (the
    float32-multiply rounding in simsearch._cos is fine for top-k
    ranking but would diverge from a double-computing replay engine
    at ~1e-7 — enough to flip a threshold decision)."""
    d = lambda x: x.cast("double")
    dot = F.aggregate(
        F.zip_with(ea, eb, lambda x, y: d(x) * d(y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(
        F.transform(ea, lambda x: d(x) * d(x)), F.lit(0.0),
        lambda a, x: a + x,
    ))
    nb = F.sqrt(F.aggregate(
        F.transform(eb, lambda x: d(x) * d(x)), F.lit(0.0),
        lambda a, x: a + x,
    ))
    return dot / (na * nb)


def assign_clusters(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, cos_to_centroid): nearest centroid by cosine,
    ties to the lowest centroid id. Centroids: (cluster, centroid)."""
    scored = embeddings.select(id_col, emb_col).join(
        F.broadcast(centroids.select("cluster", "centroid"))
    )
    best = (
        scored.withColumn(
            "_cos", F.round(_cos(F.col(emb_col), F.col("centroid")), 9)
        )
        .groupBy(id_col)
        .agg(
            F.max(F.struct(
                F.col("_cos"), (-F.col("cluster")).alias("_nc")
            )).alias("_b")
        )
        .select(
            id_col,
            (-F.col("_b._nc")).cast("int").alias("cluster"),
            F.col("_b._cos").alias("cos_to_centroid"),
        )
    )
    return best


def default_centroids(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Deterministic seeding: the k smallest ids become centroids
    0..k-1 (id order). Replayable by any engine; swap in k-means
    centroids for production quality."""
    rows = (
        embeddings.select(id_col, emb_col)
        .orderBy(F.asc(id_col))
        .limit(k)
    )
    return rows.select(
        F.col(id_col).alias("_cid"), F.col(emb_col).alias("centroid")
    ).withColumn(
        "cluster", F.row_number().over(W.orderBy(F.asc("_cid"))) - 1
    ).select("cluster", "centroid")


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    tau: float = 0.95,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, is_dup): is_dup = true iff some same-cluster row
    with a smaller id has cosine >= tau. Keep `is_dup = false` rows.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    if centroids is None:
        centroids = default_centroids(embeddings, k, id_col, emb_col)
    # lazily localCheckpoint the assignment: it feeds THREE consumers
    # (both sides of the pair self-join + the output join) and
    # Catalyst clones the k x N broadcast-argmax subtree per consumer
    # otherwise (the q56 flagged-set lesson, measured 4x there). The
    # checkpointed table is ids+cluster+cos only — embeddings rejoin
    # from the (cheap, columnar) base scan per consumer.
    assigned = assign_clusters(
        embeddings, centroids, id_col, emb_col
    ).localCheckpoint(eager=False)
    sided = assigned.join(
        embeddings.select(id_col, emb_col), id_col
    ).select(
        F.col(id_col).alias("id"), "cluster", F.col(emb_col).alias("e")
    )
    a, b = sided.alias("a"), sided.alias("b")
    # whole predicate in the join condition, cheap equality first
    dup_ids = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("b.id") < F.col("a.id"))
            & (F.round(_cos(F.col("a.e"), F.col("b.e")), 9) >= F.lit(tau)),
        )
        .select(F.col("a.id").alias("id"))
        .distinct()
    )
    return (
        assigned.select(F.col(id_col).alias("id"), "cluster")
        .join(dup_ids.withColumn("is_dup", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )
