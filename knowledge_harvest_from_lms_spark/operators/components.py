"""Connected components at scale: the alternating large-star /
small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi &
Vassilvitskii, "Connected Components in MapReduce and Beyond",
SoCC 2014 — re-derived from the published algorithm, no engine code
consulted).

Why a second CC implementation next to ``graph.canonical_map``'s
label propagation: label prop converges in O(diameter) rounds — fine
for the tiny spelling clusters it serves (its documented contract),
but a long path/chain component needs as many shuffle rounds as its
length. The star algorithm contracts components in O(log n) rounds
REGARDLESS of shape (each large-star halves tree heights in
expectation), which is the bound you want when the input is an
arbitrary 10^10-edge similarity graph rather than a pile of
near-clique dup clusters. ``tests/test_components.py`` pins the two
implementations equal on LSH pair graphs and the star algorithm
alone on adversarial chains where label prop's iteration cap would
give up.

Per round, each star operation is: explode edges both directions
(every undirected edge appears as (u,v) and (v,u)), one
``min(neighbor ∪ self)`` aggregate per node (map-side combining — a
hub's million neighbors collapse to partials), one join back to
re-point edges. The edge set only shrinks or re-points — never
grows — and rounds end when a checksum aggregate (count + xor of
xxhash64) is stable, checked driver-side on a 2-row result. Eager
``localCheckpoint`` per round keeps lineage depth O(1) (the
pagerank/BPE-trainer discipline).

Scale: per round 2-3 shuffles of the current edge set, O(log n)
rounds; driver state is one checksum pair per round. Skew: the
aggregate absorbs hubs map-side; the join-back key is the node id —
a mega-hub's fan-out is AQE skew-split material, and the algorithm
itself shrinks hubs every round (that is its point).

Output contract: one row per VERTEX that appears in the edge set,
``(vertex, component)`` with component = the component's minimum
vertex id — the same canonical-representative convention as
``canonical_map`` / ``dedup.cluster_decisions``, so downstream
survivor rules compose unchanged. Isolated vertices never enter an
edge list; union them in upstream if they must appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame) -> DataFrame:
    """Both directions, self-loops dropped, NULLs dropped (an edge to
    an unknown vertex identifies nothing), exact dups collapsed."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).filter(
        F.col("src").isNotNull()
        & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    )
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _min_neighbor(direct: DataFrame) -> DataFrame:
    """(u, m) with m = min(N(u) ∪ {u}) over the directed view."""
    return (
        direct.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .withColumn("m", F.least("__mn", "u"))
        .drop("__mn")
    )


def _large_star(direct: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to min(N(u) ∪ {u})."""
    m = _min_neighbor(direct)
    return (
        direct.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(direct: DataFrame) -> DataFrame:
    """Connect every neighbor <= u (and u itself) to min(N(u) ∪ {u});
    operates on the (v <= u) half-view plus the self edge."""
    half = direct.filter(F.col("v") < F.col("u"))
    m = (
        half.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .withColumn("m", F.least("__mn", "u"))
        .drop("__mn")
    )
    pointed = (
        half.join(m, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .union(m.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pointed


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
    out_vertex: str = "vertex",
    out_component: str = "component",
) -> DataFrame:
    """(vertex, component) for every vertex in ``edges``; component =
    min vertex id of its connected component. Ids must be orderable
    (ints or strings). Raises on non-convergence past ``max_iters``
    (the algorithm's O(log n) bound makes 50 absurdly safe — hitting
    it means the input violates the contract, e.g. ids mutating
    between actions)."""
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    )
    cur = _undirected(e).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).distinct()
    cur = cur.localCheckpoint()

    def _sig(df: DataFrame) -> tuple:
        # bit_xor, not sum: a long-sum of hashes can overflow, which
        # ANSI mode (Spark 4 default) turns into a runtime error
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    prev = None
    for _ in range(max_iters):
        direct = _undirected(cur)
        ls = _large_star(direct)
        # the star ops re-point edges downward; after large-star the
        # edge list is already directed (big -> small), so small-star
        # consumes its undirected view the same way
        ss = _small_star(_undirected(ls))
        cur = ss.localCheckpoint()
        sig = _sig(cur)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    # converged state: every edge is (member -> root). Roots appear
    # only as dst; emit them as their own component members.
    members = cur.select(
        F.col("src").alias(out_vertex), F.col("dst").alias(out_component)
    )
    roots = cur.select(F.col("dst").alias(out_vertex)).distinct().withColumn(
        out_component, F.col(out_vertex)
    )
    return members.union(roots).distinct()
