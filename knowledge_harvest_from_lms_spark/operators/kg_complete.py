"""KG completion — predicting the edges the harvest missed, and
manufacturing the training pairs embedding models need.

The reference emits the triples its prompt ensemble can elicit
(`knowledge_harvest/lm.py` ranked ent_tuples) and stops; a deployed
KG pipeline's next moves are (a) LINK PREDICTION — infer (subj, pred,
obj) edges from graph structure so the harvest's gaps get candidate
fills with calibrated confidence (NELL's PRA learner, Knowledge
Vault's path features), and (b) NEGATIVE SAMPLING — corrupt true
triples into plausible-but-false ones, the training signal every
TransE-style embedding or triple-classifier needs.

* ``pra_score`` — Path Ranking (Lao & Cohen 2010) restricted to
  length-2 relation paths: a path type (rel1, rel2) is a feature;
  its weight is its measured PRECISION on the target predicate's
  known edges; a candidate pair scores the precision-weighted sum of
  its path instances. Pure joins + aggregates, fully relational.
* ``negative_samples`` — deterministic hash-bucketed tail corruption:
  for each true triple, pick ``k`` pseudo-random replacement objects
  from the entity pool, then anti-join away accidental true triples
  (the standard "filtered" setting).

Plan shapes — the scale decisions:

* PRA's 2-hop enumeration is the wedge join (the q64 triangle shape):
  volume is Σ deg_in·deg_out over mid vertices, so HUB vertices
  dominate. ``max_fanout`` prunes mids whose total degree exceeds the
  cap BEFORE the join (two bounded aggregates + a semi filter) — the
  degree-capped regime PRA implementations run in practice; the cap
  is a documented recall knob, not a correctness one. Path-type
  precision is measured on a |path-types|-sized table (tiny) joined
  back broadcast-style; known edges leave via LEFT ANTI.
* Negative sampling never builds a global entity index (a global
  row_number over 10^9 entities is one task): entities land in
  ``n_buckets`` hash buckets; each (triple, i) probe hashes to a
  bucket and takes the min-hash entity within it — an equi-join on
  the bucket key plus one bounded min(struct) aggregate per probe,
  both map-side combining. Determinism is total: every choice is a
  pure function of (subj, pred, obj, i, seed) and the entity pool.

Engine parity: scores publish as exact integer path counts times a
round(precision, 9) — one deterministic IEEE multiply-and-round per
path type (both engines see identical inputs); hashes are the
portable avalanche hash `operators/sketches.py::kmv_hash` pins
across Spark/DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_hop_paths(
    edges: DataFrame,
    max_fanout: int | None = None,
) -> DataFrame:
    """``(src, rel1, rel2, dst, n_paths)`` — length-2 relation-path
    instances. ``max_fanout`` drops mid vertices whose in+out degree
    exceeds the cap before the wedge join (the hub guard)."""
    e = edges.select("src", "rel", "dst").distinct()
    if max_fanout is not None:
        deg = (
            e.select(F.col("src").alias("v"))
            .unionAll(e.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") <= max_fanout)
            .select("v")
        )
        e1 = e.join(deg.withColumnRenamed("v", "dst"), "dst", "leftsemi")
        e2 = e.join(deg.withColumnRenamed("v", "src"), "src", "leftsemi")
    else:
        e1, e2 = e, e
    a = e1.select(
        F.col("src"), F.col("rel").alias("rel1"), F.col("dst").alias("_mid")
    )
    b = e2.select(
        F.col("src").alias("_mid"), F.col("rel").alias("rel2"), F.col("dst")
    )
    return (
        a.join(b, "_mid")
        .groupBy("src", "rel1", "rel2", "dst")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )


def pra_score(
    edges: DataFrame,
    target_rel: str,
    max_fanout: int | None = None,
    min_precision: float = 0.0,
) -> DataFrame:
    """Score candidate ``(src, dst)`` pairs for ``target_rel`` by
    precision-weighted length-2 path evidence.

    Steps (all relational):

    1. enumerate 2-hop path instances (:func:`two_hop_paths`) — the
       trivial leaking feature (the length-1 path that IS the target
       edge) is excluded by construction, since only length-2 types
       exist; paths THROUGH target-relation edges elsewhere in the
       graph are legitimate PRA features (e.g. in_nation ∘ in_region
       predicting in_region is the classic composition);
    2. per path type (rel1, rel2): ``precision`` = fraction of
       distinct (src, dst) pairs carrying that path type that are
       already known ``target_rel`` edges;
    3. candidate score = Σ over path types of
       ``n_paths * round(precision, 9)``; known edges leave via LEFT
       ANTI — the output is exactly the NEW predictions.

    Output: ``(src, dst, score, n_path_types)``, score > 0. The
    |path-types|-sized precision table is broadcast-joined back onto
    the path instances."""
    paths = two_hop_paths(edges, max_fanout=max_fanout)
    known = (
        edges.filter(F.col("rel") == target_rel)
        .select("src", "dst")
        .distinct()
    )
    pair_types = paths.select("src", "rel1", "rel2", "dst").distinct()
    prec = (
        pair_types.join(
            known.withColumn("_pos", F.lit(1)), ["src", "dst"], "left"
        )
        .groupBy("rel1", "rel2")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.coalesce(F.col("_pos"), F.lit(0))).alias("_k"),
        )
        .select(
            "rel1",
            "rel2",
            F.round(F.col("_k") / F.col("_n"), 9).alias("precision"),
        )
    )
    if min_precision > 0.0:
        prec = prec.filter(F.col("precision") >= min_precision)
    scored = (
        paths.join(F.broadcast(prec), ["rel1", "rel2"])
        .groupBy("src", "dst")
        .agg(
            F.round(
                F.sum(F.col("n_paths") * F.col("precision")), 9
            ).alias("score"),
            F.count(F.lit(1)).alias("n_path_types"),
        )
        .filter(F.col("score") > 0)
    )
    return scored.join(known, ["src", "dst"], "left_anti")


def negative_samples(
    triples: DataFrame,
    entities: DataFrame,
    k: int = 2,
    seed: int = 0,
    n_buckets: int = 64,
    entity_col: str = "entity",
) -> DataFrame:
    """``(subj, pred, obj, neg_obj, probe)`` — ``k`` corrupted-tail
    negatives per true triple, filtered against the true set.

    For probe ``i`` in 0..k-1 the replacement object is the entity
    with the smallest avalanche hash (salted by ``i``) inside bucket
    ``avalanche(subj|pred|obj|i, seed) % n_buckets`` of the entity
    pool — a pure function of the inputs, so retries, AQE re-plans,
    and cluster size can never change the sample (the
    `operators/sampling.py` determinism contract; the hash is
    `operators/sketches.py::kmv_hash`, the portable avalanche DuckDB
    replays byte-for-byte). Probes whose chosen entity equals the
    true object, or that collide with ANY true triple of the same
    (subj, pred) (the standard "filtered" negative-sampling setting),
    drop via anti-joins — callers get at MOST k negatives per triple,
    the usual contract. Key fields join with '|' — callers with '|'
    in entity names pass pre-escaped columns."""
    from .sketches import kmv_hash

    ent = entities.select(F.col(entity_col).alias("_e")).distinct()
    # one champion entity per bucket per probe-salt: min avalanche
    # hash — bounded state, map-side combining
    champs = (
        ent.withColumn(
            "probe", F.explode(F.array(*[F.lit(i) for i in range(k)]))
        )
        .select(
            F.pmod(kmv_hash(F.col("_e"), seed), F.lit(n_buckets)).alias("_b"),
            "probe",
            "_e",
            kmv_hash(
                F.concat_ws("|", F.col("_e"), F.col("probe").cast("string")),
                seed + 1,
            ).alias("_h"),
        )
        .groupBy("_b", "probe")
        .agg(F.min(F.struct(F.col("_h"), F.col("_e"))).alias("_c"))
        .select("_b", "probe", F.col("_c._e").alias("neg_obj"))
    )
    t = triples.select("subj", "pred", "obj").distinct()
    probes = t.withColumn(
        "probe", F.explode(F.array(*[F.lit(i) for i in range(k)]))
    ).withColumn(
        "_b",
        F.pmod(
            kmv_hash(
                F.concat_ws(
                    "|",
                    F.col("subj"),
                    F.col("pred"),
                    F.col("obj"),
                    F.col("probe").cast("string"),
                ),
                seed,
            ),
            F.lit(n_buckets),
        ),
    )
    cand = probes.join(champs, ["_b", "probe"]).filter(
        F.col("neg_obj") != F.col("obj")
    )
    true_pairs = t.select(
        "subj", "pred", F.col("obj").alias("neg_obj")
    ).distinct()
    return cand.join(
        true_pairs, ["subj", "pred", "neg_obj"], "left_anti"
    ).select("subj", "pred", "obj", "neg_obj", "probe")
