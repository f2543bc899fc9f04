"""Distributed triangle counting over an edge list — the classic
degree-ordered-orientation algorithm (Schank & Wagner 2005; the shape
behind Cohen's MapReduce triangle counter and GraphFrames' count).

Why not the naive three-way self-join: wedge volume through an
unoriented join explodes around high-degree hubs (a degree-d vertex
contributes d^2 wedges — webtext co-occurrence graphs have power-law
hubs). Orienting every edge from its lower-(degree, id) endpoint to
the higher one makes each triangle countable exactly once at its
lowest apex AND bounds every oriented out-degree by O(sqrt(m)), so
the wedge join is O(m^1.5) worst-case instead of sum(d^2).

Plan shape: two shuffles build degrees + orientation (a groupBy and
a join keyed on the edge endpoints), ONE wedge self-join on the apex
(the only super-linear stage, bounded as above), and a final
semi-join of wedges against the canonical edge set. All pure
DataFrame ops; q64 replays the whole thing against a brute-force
ordered triple self-join in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected, deduped, self-loop-free: (a, b) with a < b."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(vertex, n_triangles) for every vertex in at least one
    triangle. Global count = sum(n_triangles) / 3."""
    e = _canonical(edges, src, dst)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient low-(degree, id) -> high-(degree, id); the (d, v) struct
    # comparison is the deterministic total order
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        e.join(da, F.col("a") == F.col("da.v"))
        .join(db, F.col("b") == F.col("db.v"))
        .select(
            F.when(
                F.struct(F.col("da.d"), F.col("a"))
                < F.struct(F.col("db.d"), F.col("b")),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(
                F.struct(F.col("b").alias("u"), F.col("a").alias("w"))
            )
            .alias("_e")
        )
        .select(F.col("_e.u").alias("u"), F.col("_e.w").alias("w"))
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.w") < F.col("o2.w")),
    ).select(
        F.col("o1.u").alias("apex"),
        F.col("o1.w").alias("x"),
        F.col("o2.w").alias("y"),
    )
    # closing edge lookup against the canonical set (x < y already)
    tri = wedges.join(
        e, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")), "left_semi"
    )
    return (
        tri.select(
            F.explode(F.array("apex", "x", "y")).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
