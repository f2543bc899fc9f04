"""SemDeDup semantic dedup: planted near-duplicates are flagged,
survivors are the earliest ids, clustering is deterministic, and the
self-join only compares within clusters."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.semantic_dedup import (
    assign_clusters,
    default_centroids,
    semantic_dedup,
)


def _vecs(spark, arrs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(arrs)]
    )


@pytest.fixture(scope="module")
def planted(spark):
    """Two well-separated directions; ids 0/1 seed the clusters.
    id2 ~ id0 (near-dup), id3 = id0 exactly, id4 ~ id1, id5 is id1
    rotated far enough to stay unique at tau=0.95."""
    a, b = np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0])
    rows = [
        a,                                  # 0: survivor cluster 0
        b,                                  # 1: survivor cluster 1
        a + [0.0, 0.02, 0.0],               # 2: dup of 0
        a,                                  # 3: exact dup of 0
        b + [0.015, 0.0, 0.0],              # 4: dup of 1
        b + [0.5, 0.0, 0.0],                # 5: same cluster, cos ~0.89
    ]
    return _vecs(spark, rows)


def test_planted_dups_flagged(spark, planted):
    out = {r["vec_id"]: (r["cluster"], r["is_dup"])
           for r in semantic_dedup(planted, k=2, tau=0.95).collect()}
    assert out[0] == (0, False)
    assert out[1] == (1, False)
    assert out[2] == (0, True)
    assert out[3] == (0, True)
    assert out[4] == (1, True)
    assert out[5] == (1, False)   # below tau: kept


def test_exact_dup_always_flagged_any_tau(spark, planted):
    out = {r["vec_id"]: r["is_dup"]
           for r in semantic_dedup(planted, k=2, tau=1.0).collect()}
    assert out[3] is True and sum(out.values()) == 1


def test_assignment_tie_breaks_to_lowest_cluster(spark):
    """A vector equidistant from two identical centroids goes to
    cluster 0."""
    emb = _vecs(spark, [[1.0, 0.0], [1.0, 0.0], [1.0, 0.1]])
    cents = default_centroids(emb, k=2)
    got = {r["vec_id"]: r["cluster"]
           for r in assign_clusters(emb, cents).collect()}
    assert got == {0: 0, 1: 0, 2: 0}


def test_custom_centroids_respected(spark, planted):
    cents = spark.createDataFrame(
        [Row(cluster=0, centroid=[0.0, 1.0, 0.0]),
         Row(cluster=1, centroid=[1.0, 0.0, 0.0])]
    )
    out = semantic_dedup(planted, tau=0.95, centroids=cents)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert got[0] == 1 and got[1] == 0   # swapped on purpose


def test_real_embeddings_smoke(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, k=4, tau=0.99)
    n = emb.count()
    assert out.count() == n
    assert out.filter(~F.col("is_dup")).count() >= 4  # >= one per cluster


def test_bad_tau(spark, planted):
    with pytest.raises(ValueError, match="tau"):
        semantic_dedup(planted, tau=0.0)


def test_pair_join_is_equijoin_on_cluster(spark, planted):
    """The candidate-pair self-join must hash on the cluster id (the
    N^2/k move); the only nested-loop joins allowed are the bounded
    broadcast centroid fan-outs of the assignment step."""
    import re

    df = semantic_dedup(planted, k=2)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"(BroadcastHash|SortMerge|ShuffledHash)Join \[cluster", plan)
    for line in plan.splitlines():
        if "NestedLoop" in line or "CartesianProduct" in line:
            assert "BroadcastNestedLoopJoin" in line  # centroid fan-out only
