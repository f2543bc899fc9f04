"""Deterministic random walks + bounded transitive closure over an
edge DataFrame — the graph-embedding / KG-inference preprocessing
pair.

``random_walks`` generates the DeepWalk/node2vec-style walk corpus
(Perozzi et al. 2014) an entity-embedding trainer consumes: fixed-
length truncated walks from every vertex. The usual formulation —
"pick a uniformly random neighbor" — is rewritten so it is (a)
DETERMINISTIC (replayable across retries, AQE re-plans, and a second
engine: the DuckDB oracle replays every step bit-for-bit) and (b)
skew-safe: instead of indexing into a per-node neighbor list (which
needs a window / collect_list over the node key — a mega-hub's
in-partition neighbor list is exactly the skew this repo designs
out), each candidate neighbor draws an independent portable hash of
(walk_id, step, neighbor) and the walk takes the ARGMIN. The argmin
of iid hashes is a uniform choice among neighbors, computed as a
map-side-combining ``min(struct(h, dst))`` aggregate — a hub's
million out-edges collapse to one partial per partition, the same
trick as dedup's winner rule (operators/dedup.py) and the
sessionization argmin.

Per step: ONE equi-join (frontier × edges on the current node — the
natural pre-partitionable key) + ONE aggregate. Walk state is
(walk_id, node): O(|V| * walks_per_node) rows regardless of step,
never a growing path array. Dead ends truncate the walk (inner join
drops the frontier row) — the standard truncated-walk semantics.
``localCheckpoint`` per step keeps lineage O(1) (the
components/pagerank discipline).

``bounded_closure`` is the KG-inference twin: min-hop reachability
within ``max_hops`` (e.g. ConceptNet IsA ancestor inference — the
reference's relations are single-hop by construction; a crawl-scale
KG wants the closure materialized). Frontier BFS with a global
``min(hops)`` per (src, dst) pair; each round is one join + one
aggregate, cycle-safe because a revisited pair never re-enters the
frontier (its min hop count is already final — BFS invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import kmv_hash


def _clean_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 1,
    walk_length: int = 3,
    seed: int = 0,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Walk corpus ``(walk_id, start, step, node)``: ``walks_per_node``
    truncated walks of ``walk_length`` steps from every distinct
    source vertex. walk_id = ``start || '#' || w``; step 0 is the
    start vertex itself. Duplicate edges are collapsed first
    (distinct) so parallel edges don't bias the uniform choice —
    multiplicity-weighted sampling is a different estimator; feed
    pre-weighted edges if that is wanted."""
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    e = _clean_edges(edges, src_col, dst_col).distinct()
    frontier = (
        e.select("src").distinct()
        .select(
            F.col("src").alias("start"),
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1))
            ).alias("w"),
        )
        .select(
            F.concat_ws("#", F.col("start"), F.col("w")).alias("walk_id"),
            "start",
            F.col("start").alias("node"),
        )
    )
    out = frontier.select(
        "walk_id", "start", F.lit(0).alias("step"), "node"
    )
    for t in range(1, walk_length + 1):
        key = F.concat_ws(
            ":", F.col("walk_id"), F.lit(str(t)), F.col("dst")
        )
        cand = frontier.join(
            e, frontier["node"] == e["src"], "inner"
        ).select(
            "walk_id",
            "start",
            F.struct(
                kmv_hash(key, seed).alias("h"), F.col("dst").alias("d")
            ).alias("hd"),
        )
        frontier = (
            cand.groupBy("walk_id", "start")
            .agg(F.min("hd").alias("m"))
            .select("walk_id", "start", F.col("m.d").alias("node"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            frontier.select(
                "walk_id", "start", F.lit(t).alias("step"), "node"
            )
        )
    return out


def bounded_closure(
    edges: DataFrame,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Min-hop transitive closure ``(src, dst, hops)`` over directed
    edges, truncated at ``max_hops``. Self-pairs reached through a
    cycle ARE reported (src == dst with hops = cycle length); the
    trivial 0-hop self-pair is not. Output size is the closure's —
    bounded by |V|^2 in theory, by the graph's ``max_hops``-
    neighborhood growth in practice; callers cap hops accordingly
    (closures of scale-free graphs explode fast — that is a property
    of the data, not the plan)."""
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = _clean_edges(edges, src_col, dst_col).distinct()
    closure = e.select("src", "dst", F.lit(1).alias("hops"))
    frontier = closure
    for t in range(2, max_hops + 1):
        step = (
            frontier.alias("f")
            .join(e.alias("e"), F.col("f.dst") == F.col("e.src"), "inner")
            .select(
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
                F.lit(t).alias("hops"),
            )
        )
        # BFS invariant: only pairs never seen at a smaller hop count
        # re-enter the frontier — cycle-safe and monotone-shrinking
        # on finite graphs.
        frontier = (
            step.join(closure.select("src", "dst"), ["src", "dst"], "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        closure = closure.unionByName(frontier)
    return closure
