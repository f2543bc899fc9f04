"""KG refinement — turning a pile of mined triples into a knowledge
graph you can trust: predicate type signatures, temporal scoping,
paraphrase-cluster predicate canonicalization, and source-reliability
truth finding.

The reference stops at ranked (subj, obj) tuples per relation
(`knowledge_harvest/lm.py` emits score-sorted ent_tuples); a web-scale
deployment's next stage is the Knowledge-Vault/NELL refinement layer
this module provides over the corpus-mined side (openie.py, hearst.py,
dirt.py) and the MLM-harvested side alike:

* ``relation_type_signatures`` — schema induction: the dominant
  (subject type, object type) per predicate, read off the IsA table.
  The reference encodes types implicitly in each relation's seed
  pairs (`relation_info.json` init_ent_tuples); here they are
  MEASURED, so a mined predicate arrives with its argument types.
* ``temporal_scope`` — validity windows per triple from crawl
  timestamps (first/last sighting, observation counts) — the temporal
  KG move (e.g. Wikidata qualifiers); drives staleness policies.
* ``canonicalize_predicates`` — collapse paraphrase predicates
  ("married"/"wed") onto one canonical name using the DIRT overlap
  graph (`operators/dirt.py`) + connected components
  (`operators/components.py`); the corpus-side twin of the
  reference's prompt-paraphrase ENSEMBLE (one relation, many
  surface forms, pooled evidence).
* ``truth_finding`` — Sums/HITS-style mutual reinforcement
  (Pasternack & Roth 2010; the Knowledge Vault fusion idea): a fact
  asserted by reliable sources is credible; a source asserting
  credible facts is reliable. Bounded alternating aggregates.

Plan shapes — the scale decisions:

* Type signatures: two equi-joins onto the types table (entity-keyed;
  Zipf-headed entities are ordinary join skew — AQE splits), then a
  map-side-combining count and TWO aggregate argmax passes (max
  support per pred, then min type-pair among ties) — deterministic
  tiebreaks with no window over the full typed stream.
* Temporal scope: ONE map-side-combining aggregate (min/max/count
  monoids — bounded state per triple key).
* Canonicalization: the paraphrase graph is |predicates|-sized —
  VASTLY smaller than the triple stream — so components run on the
  small derived table and the remap is one broadcast-able join back
  onto triples, then one re-aggregation.
* Truth finding: per round, two equi-joins (claims×trust on source,
  claims×confidence on the fact key) and two aggregates, all
  map-side-combining; `localCheckpoint` per round keeps lineage O(1)
  like kcore/components. Rounds are driver-bounded (fixed
  ``n_iters``), never data-dependent.

Engine-parity contract (why the integer quantization): every
aggregation boundary sums ``round(x * 1e9)`` as BIGINT — the q01
cents trick — so partial-merge order can never wobble a bit; the only
float ops are one scale, one round, and one division of two exact
BIGINTs per round, each a deterministic IEEE op on identical inputs
in Spark and DuckDB. The published scores are therefore bit-stable
across shuffle orders, cluster sizes, AND engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1_000_000_000  # trust/confidence quantization (nanos)


def relation_type_signatures(
    triples: DataFrame,
    types: DataFrame,
    entity_col: str = "entity",
    type_col: str = "type",
) -> DataFrame:
    """``(pred, subj_type, obj_type, support, share)`` — the dominant
    argument-type pair per predicate.

    ``triples`` is ``(subj, pred, obj, ...)``; ``types`` maps entities
    to (possibly several) types, e.g. the IsA table from
    `operators/hearst.py` or `operators/taxonomy.py`. A triple
    contributes one support unit per (subj type × obj type)
    combination; triples with an untyped subject or object drop
    (inner joins — type coverage is the caller's knob). ``share`` is
    support / all typed combinations for that predicate. Ties on
    support break to the lexicographically smallest
    (subj_type, obj_type) — a documented deterministic contract, like
    `operators/taxonomy.py`'s tiebreaks."""
    ty = types.select(
        F.col(entity_col).alias("_e"), F.col(type_col).alias("_t")
    ).distinct()
    typed = (
        triples.select("subj", "pred", "obj")
        .join(ty.withColumnRenamed("_e", "subj"), "subj")
        .withColumnRenamed("_t", "subj_type")
        .join(ty.withColumnRenamed("_e", "obj"), "obj")
        .withColumnRenamed("_t", "obj_type")
    )
    counts = typed.groupBy("pred", "subj_type", "obj_type").agg(
        F.count(F.lit(1)).alias("support")
    )
    totals = counts.groupBy("pred").agg(
        F.sum("support").alias("_total"), F.max("support").alias("_best")
    )
    best = (
        counts.join(totals, "pred")
        .filter(F.col("support") == F.col("_best"))
        .groupBy("pred", "support", "_total")
        .agg(F.min(F.struct("subj_type", "obj_type")).alias("_ty"))
    )
    return best.select(
        "pred",
        F.col("_ty.subj_type").alias("subj_type"),
        F.col("_ty.obj_type").alias("obj_type"),
        "support",
        F.round(F.col("support") / F.col("_total"), 6).alias("share"),
    )


def temporal_scope(
    triples: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """``(subj, pred, obj, first_seen, last_seen, n_obs, n_moments)``
    — validity window + observation density per triple from sighting
    timestamps (one input row per sighting, e.g. per page asserting
    the triple, with its ``warc_ts``). One bounded-state aggregate."""
    ts = F.col(ts_col)
    return triples.groupBy("subj", "pred", "obj").agg(
        F.min(ts).alias("first_seen"),
        F.max(ts).alias("last_seen"),
        F.count(ts).alias("n_obs"),
        F.count_distinct(ts).alias("n_moments"),
    )


def canonicalize_predicates(
    triples: DataFrame,
    min_jaccard: float = 0.5,
    min_overlap: int = 1,
) -> DataFrame:
    """Collapse paraphrase predicates onto one canonical surface form.

    Pipeline: DIRT argument-pair overlap (`discover_paraphrases`) →
    keep edges with ``jaccard >= min_jaccard`` → connected components
    over the |predicates|-sized paraphrase graph → canonical name =
    min predicate string in the component (exactly the component id
    `connected_components` emits) → remap triples and re-aggregate.

    Output: ``(subj, pred, obj, support, n_variants)`` with ``pred``
    canonical, ``support`` = distinct-triple rows folded in, and
    ``n_variants`` = distinct surface predicates that contributed to
    THIS (subj, pred, obj) row."""
    from .components import connected_components
    from .dirt import discover_paraphrases

    t = triples.select("subj", "pred", "obj").distinct()
    edges = discover_paraphrases(t, min_overlap=min_overlap).filter(
        F.col("jaccard") >= min_jaccard
    )
    canon = connected_components(edges, src="pred_a", dst="pred_b")
    remapped = t.join(
        canon.withColumnRenamed("vertex", "pred"), "pred", "left"
    ).select(
        "subj",
        F.coalesce("component", "pred").alias("canon_pred"),
        "obj",
        "pred",
    )
    return remapped.groupBy(
        "subj", F.col("canon_pred").alias("pred"), "obj"
    ).agg(
        F.count(F.lit(1)).alias("support"),
        F.count_distinct(F.col("pred")).alias("n_variants"),
    )


def predicate_functionality(triples: DataFrame) -> DataFrame:
    """``(pred, n_subjs, n_pairs, functionality, avg_objs)`` — is a
    predicate single-valued? NELL's coupling-constraint learner and
    Knowledge Vault's fusion layer both MEASURE which relations are
    functional (born_in: one value per subject) rather than asserting
    it; the measurement is the gate for
    :func:`functional_violations`. ``functionality`` = fraction of
    subjects asserting exactly one distinct object; ``avg_objs`` =
    mean distinct objects per subject, rounded to 6 places.

    Plan shape: two map-side-combining hash aggregates — per
    (pred, subj) distinct-object counts, then per pred — bounded
    state, no window, no join."""
    per_subj = triples.groupBy("pred", "subj").agg(
        F.count_distinct("obj").alias("_n")
    )
    return per_subj.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_subjs"),
        F.sum("_n").alias("n_pairs"),
        F.round(
            F.avg(F.when(F.col("_n") == 1, 1.0).otherwise(0.0)), 6
        ).alias("functionality"),
        F.round(F.avg(F.col("_n")), 6).alias("avg_objs"),
    )


def functional_violations(
    triples: DataFrame,
    max_objs_listed: int = 8,
) -> DataFrame:
    """Conflict detection for single-valued predicates: subjects of a
    functional predicate asserting ≥2 distinct objects, with the
    majority object proposed for resolution.

    Input is SIGHTINGS — one row per assertion (per page / per
    source), so support counts weigh the resolution the way
    `truth_finding` weighs sources. The caller filters ``triples`` to
    the functional predicates first (e.g. ``functionality >= 0.95``
    from :func:`predicate_functionality`); this operator reports every
    multi-object subject among what it is given.

    Output per conflicted ``(pred, subj)``: ``n_objs`` (distinct
    objects), ``total_support`` (all sightings), ``top_obj`` /
    ``top_support`` (majority object — ties break to the
    lexicographically smallest object, the documented deterministic
    contract used throughout this module), and ``objs`` — the first
    ``max_objs_listed`` objects in sorted order, comma-joined (a
    STRING for byte-stable engine replay; the cap exists so a junk
    subject asserting thousands of objects can't blow up a row).

    Plan shape: sightings fold to one row per (pred, subj, obj) in a
    map-side-combining aggregate FIRST (a Zipf-headed assertion
    collapses per partition), then per-(pred, subj) stats + the
    argmax run as aggregate passes over the distinct-object table —
    support max via ``max(struct(support, obj_rev))`` would need a
    string negation, so the tiebreak uses the two-pass shape
    `relation_type_signatures` pins: max support, then min obj among
    ties. The ``objs`` list rides a ``row_number() <= cap`` rank
    filter that compiles to a map-side PARTIAL WindowGroupLimit
    below the exchange (the `operators/sketches.py` KMV shape), so
    per-key window AND aggregate state are both cap-bounded — never
    an unbounded ``collect_set``. No window over the raw triple
    stream."""
    from pyspark.sql import Window

    sight = triples.groupBy("pred", "subj", "obj").agg(
        F.count(F.lit(1)).alias("support")
    )
    per = sight.groupBy("pred", "subj").agg(
        F.count(F.lit(1)).alias("n_objs"),
        F.sum("support").alias("total_support"),
        F.max("support").alias("_best"),
    ).filter(F.col("n_objs") >= 2)
    w = Window.partitionBy("pred", "subj").orderBy("obj")
    objs = (
        sight.select("pred", "subj", "obj")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_objs_listed)
        .groupBy("pred", "subj")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("obj"))).alias("objs")
        )
    )
    top = (
        sight.join(per.select("pred", "subj", "_best"), ["pred", "subj"])
        .filter(F.col("support") == F.col("_best"))
        .groupBy("pred", "subj")
        .agg(F.min("obj").alias("top_obj"))
    )
    return per.join(top, ["pred", "subj"]).join(objs, ["pred", "subj"]).select(
        "pred",
        "subj",
        "n_objs",
        "total_support",
        "top_obj",
        F.col("_best").alias("top_support"),
        "objs",
    )


def truth_finding(
    claims: DataFrame,
    n_iters: int = 5,
    return_trust: bool = False,
) -> DataFrame:
    """Sums-style mutual reinforcement over ``(subj, pred, obj,
    source)`` claims: fact confidence = Σ trust of asserting sources;
    source trust = Σ confidence of asserted facts; each side
    max-normalized per round. ``n_iters`` rounds (driver-bounded).

    Returns ``(subj, pred, obj, n_sources, confidence)`` — or the
    source table ``(source, n_facts, trust)`` when ``return_trust``.
    Confidence/trust are in (0, 1] with the max element exactly 1.0.

    Exactness: sums quantize to BIGINT nanos first (order-exact
    merges; see module docstring), so results are bit-stable across
    partitionings and match the unrolled-SQL oracle bit-for-bit."""
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    c = (
        claims.select("subj", "pred", "obj", "source")
        .distinct()
        .localCheckpoint()
    )
    trust = c.select("source").distinct().select(
        "source", F.lit(1.0).alias("t")
    )
    nano = lambda col: F.round(F.col(col) * _Q).cast("long")  # noqa: E731
    conf = None
    for _ in range(n_iters):
        raw_c = (
            c.join(trust, "source")
            .groupBy("subj", "pred", "obj")
            .agg(F.sum(nano("t")).alias("_cq"))
        )
        cmax = raw_c.agg(F.max("_cq").alias("_cm"))
        conf = raw_c.crossJoin(F.broadcast(cmax)).select(
            "subj", "pred", "obj",
            (F.col("_cq") / F.col("_cm")).alias("cf"),
        ).localCheckpoint()
        raw_t = (
            c.join(conf, ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(F.sum(nano("cf")).alias("_tq"))
        )
        tmax = raw_t.agg(F.max("_tq").alias("_tm"))
        trust = raw_t.crossJoin(F.broadcast(tmax)).select(
            "source", (F.col("_tq") / F.col("_tm")).alias("t")
        ).localCheckpoint()
    if return_trust:
        nf = c.groupBy("source").agg(F.count(F.lit(1)).alias("n_facts"))
        return nf.join(trust, "source").select(
            "source", "n_facts", F.round("t", 9).alias("trust")
        )
    ns = c.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    return ns.join(conf, ["subj", "pred", "obj"]).select(
        "subj", "pred", "obj", "n_sources",
        F.round("cf", 9).alias("confidence"),
    )
