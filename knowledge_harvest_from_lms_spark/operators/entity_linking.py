"""Entity linking: surface forms → canonical KB vertices.

The north rule names four graph components — "triple extraction,
entity linking, canonicalization, graph materialize". Canonicalization
(operators/graph.py) clusters surface forms *within* a harvest;
linking attaches them to an EXISTING vertex table, which at 100 TB is
the common path: every incremental drop (streaming/relations.py,
streaming/incremental.py) must resolve its entities against billions
of already-materialized vertices without an all-pairs fuzzy product.

Plan shape (both stages fully distributed, no driver loops):

  1. **exact** — equi-join on the normalized name (lower / trim /
     collapse internal whitespace). No broadcast assumption: at scale
     the vertex table is the big side, so this is a plain shuffle
     equi-join that AQE plans (broadcast kicks in automatically when
     one side is genuinely small).
  2. **fuzzy fallback** (only mentions the exact stage left unlinked)
     — SymSpell-style deletion-neighborhood blocking for edit
     distance <= 1: each side explodes {s} ∪ {s with one char
     deleted}. Any edit-1 pair shares a variant — identity covers
     insert/delete (the longer string's deletion set contains the
     shorter string), and deleting the substituted position covers
     substitutions — so the blocking is recall-LOSSLESS for the
     distance bound, unlike LSH banding. ~(len+1) variants per
     string; the join is an equi-join on the variant, verified with
     `levenshtein` and ranked deterministically (dist asc, vertex
     name asc, vertex_id asc).

Unlinked mentions are kept with method='none' — at scale they feed
back into canonicalization as candidate NEW vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _norm(col):
    return F.trim(F.lower(F.regexp_replace(col, r"\s+", " ")))


def _deletion_variants(col):
    """array: {s} ∪ {s minus the char at each position}."""
    return F.array_union(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                F.substring(col, 1, i - 1),
                col.substr(i + 1, F.length(col) - i),
            ),
        ),
    )


def build_variant_index(vertices: DataFrame) -> DataFrame:
    """Materializable deletion-variant index of a vertex table: the
    (v_norm, k) rows ``link_entities``' fuzzy stage blocks on. Persist
    as a side table of the vertex table and APPEND this function's
    output over just the new vertices per incremental drop (variant
    explosion is row-local, so append == rebuild) — instead of
    exploding every vertex name on every merge (ADVICE r3). Duplicate
    rows (replayed append, or two vertices sharing a norm) are
    harmless: the candidate join dedups (ent, m_norm, v_norm)."""
    v_norm = _norm(F.col("name")).alias("v_norm")
    return (
        vertices.select(v_norm)
        .distinct()
        .select("v_norm", F.explode(_deletion_variants(F.col("v_norm"))).alias("k"))
    )


def link_entities(
    mentions: DataFrame,
    vertices: DataFrame,
    max_edit: int = 1,
    vertex_variants: DataFrame | None = None,
) -> DataFrame:
    """mentions(ent) × vertices(vertex_id, name) →
    (ent, vertex_id, vertex_name, dist, method) with exactly one row
    per distinct mention; method ∈ {exact, fuzzy, none}.

    ``max_edit`` must be 1 (the deletion-neighborhood block is built
    for the edit-1 bound; higher bounds need chained deletions).

    ``vertex_variants``: a persisted ``build_variant_index`` table;
    when given, the fuzzy stage joins it directly and never re-explodes
    the vertex table (the exact stage still equi-joins the raw vertex
    table on the norm — a join, not a rebuild)."""
    if max_edit != 1:
        raise ValueError("link_entities supports max_edit=1")

    m = mentions.select("ent", _norm(F.col("ent")).alias("m_norm")).distinct()
    v = vertices.select(
        "vertex_id",
        F.col("name").alias("vertex_name"),
        _norm(F.col("name")).alias("v_norm"),
    )

    # stage 1: exact normalized match (best vertex on ties)
    exact = (
        m.join(v, m.m_norm == v.v_norm)
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("ent").orderBy("vertex_name", "vertex_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "ent", "vertex_id", "vertex_name",
            F.lit(0).alias("dist"), F.lit("exact").alias("method"),
        )
    )

    # stage 2: deletion-neighborhood block over the still-unlinked.
    # The exploded build side is the expensive shuffle (|vertices| ×
    # ~len+1 variant rows), so it carries ONLY (variant, v_norm) —
    # vertex ids/names rejoin on v_norm after the candidate set has
    # been deduped and distance-verified down to a few rows per
    # mention. Same final semantics (candidates are determined by the
    # norm string; the rank below still breaks ties by vertex_name,
    # vertex_id), ~2x less shuffled data per vertex.
    rest = m.join(exact.select("ent"), "ent", "left_anti")
    mv = rest.select(
        "ent", "m_norm", F.explode(_deletion_variants(F.col("m_norm"))).alias("k")
    )
    vv = (
        vertex_variants.select("v_norm", "k")
        if vertex_variants is not None
        else v.select(
            "v_norm", F.explode(_deletion_variants(F.col("v_norm"))).alias("k")
        ).distinct()
    )
    cand = (
        mv.join(vv, "k")
        .select("ent", "m_norm", "v_norm")
        .distinct()  # a pair can share several variants
        .withColumn("dist", F.levenshtein("m_norm", "v_norm"))
        .filter(F.col("dist") <= max_edit)
    )
    fuzzy = (
        cand.join(v, "v_norm")
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("ent").orderBy("dist", "vertex_name", "vertex_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("ent", "vertex_id", "vertex_name", "dist",
                F.lit("fuzzy").alias("method"))
    )

    linked = exact.unionByName(fuzzy)
    unlinked = m.join(linked.select("ent"), "ent", "left_anti").select(
        "ent",
        F.lit(None).cast("long").alias("vertex_id"),
        F.lit(None).cast("string").alias("vertex_name"),
        F.lit(None).cast("int").alias("dist"),
        F.lit("none").alias("method"),
    )
    return linked.select(
        "ent", F.col("vertex_id").cast("long").alias("vertex_id"),
        "vertex_name", F.col("dist").cast("int").alias("dist"), "method",
    ).unionByName(unlinked)
