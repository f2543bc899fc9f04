"""Horn-rule mining over the harvested KG — AMIE-style path rules
with support / head-coverage / standard & PCA confidence, and
one-step forward-chaining inference from the mined rules.

The reference emits ranked triples per relation
(`knowledge_harvest/lm.py` ent_tuples) and never looks ACROSS
relations; the canonical next refinement stage (AMIE, Galárraga et
al. WWW'13; NELL's coupled learning) mines the regularities the
harvest implies — closed length-2 Horn rules

    rel1(x, z) ∧ rel2(z, y)  ⇒  head(x, y)

— and uses them to (a) audit the graph (a high-confidence rule with
missing conclusions flags incompleteness) and (b) MATERIALIZE the
missing conclusions as calibrated-confidence candidate edges. This
generalizes q115's PRA scorer: PRA measures path precision against
ONE fixed target predicate; rule mining scores every (path type,
head predicate) combination in one dataflow.

Metrics, per rule (rel1, rel2, head) — AMIE's definitions:

* ``support``       — # distinct (x, y) pairs where body AND head hold.
* ``n_body``        — # distinct (x, y) pairs where the body holds.
* ``head_size``     — # distinct (x, y) pairs of the head predicate.
* ``head_coverage`` — support / head_size (recall against the KG).
* ``confidence``    — support / n_body (closed-world precision).
* ``pca_confidence``— support / #body pairs (x, y) with ∃y′:
  head(x, y′) — the Partial Completeness Assumption: a body pair
  only counts AGAINST the rule if the KG knows at least one head
  edge for that subject, so systematic incompleteness (a predicate
  populated for half the subjects) stops masquerading as rule
  failure. PCA is directional (functional-in-subject), documented
  here and in the AMIE paper §4.

Plan shapes — the scale decisions:

* Body enumeration reuses :func:`..operators.kg_complete.
  two_hop_paths` — the degree-capped wedge join (q64/q115 shape):
  volume is Σ deg_in·deg_out over mid vertices, hubs pruned BEFORE
  the join by ``max_fanout``.
* Every metric is a map-side-combining aggregate over the body-pair
  table; NO metric needs a window or a sort. The three side tables
  the spine joins back — n_body keyed by (rel1, rel2), head_size
  keyed by head, pca keyed by (rel1, rel2, head) — are bounded by
  |path types|, |predicates|, and |path types|·|predicates|
  respectively: rule-space-sized, not KG-sized, so Spark broadcasts
  them (AQE picks this up from size; no hint needed on a growing
  table — the q34 lesson).
* The support join (body pairs ⋈ head edges on (src, dst)) and the
  PCA join (body pairs ⋈ distinct head subjects on src) carry the
  KG-sized tables through ONE hash shuffle each on narrow keys.
* ``apply_rules`` never re-enumerates paths per rule: the mined rule
  table (rule-space-sized) broadcast-joins onto the SAME path-
  instance table on (rel1, rel2), conclusions aggregate with
  max(confidence) — a deterministic total order, never a float sum
  whose addition order could drift — and known edges leave via LEFT
  ANTI (exactly the q115 publication contract).

Engine parity: counts are exact BIGINTs; every ratio publishes as
ONE round(int/int, 9) IEEE divide — both engines see identical
integer inputs (the q111/q115 contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kg_complete import two_hop_paths


def mine_path_rules(
    edges: DataFrame,
    min_support: int = 1,
    min_confidence: float = 0.0,
    max_fanout: int | None = None,
) -> DataFrame:
    """Mine closed length-2 Horn rules from an ``(src, rel, dst)``
    edge table.

    Returns one row per rule ``(rel1, rel2, head)`` with columns
    ``(support, n_body, head_size, head_coverage, confidence,
    pca_body, pca_confidence)``, filtered to ``support >=
    min_support AND confidence >= min_confidence``. Rules whose body
    composes THROUGH the head predicate (rel1 == head etc.) are kept
    — transitivity (``in_region ∘ contains ⇒ in_region``) is exactly
    the kind of rule AMIE exists to find; the length-1 leak (the
    head edge being its own body) cannot occur since bodies are
    strictly length 2.
    """
    e = edges.select("src", "rel", "dst").distinct()
    # distinct body pairs per path type; n_paths multiplicity is
    # irrelevant to rule metrics (AMIE counts PAIRS, not paths)
    body = two_hop_paths(e, max_fanout=max_fanout).select(
        "src", "rel1", "rel2", "dst"
    )
    # `body` feeds THREE consumers (n_body, support, pca) and
    # Catalyst clones the KG-scale wedge join per consumer (the q56
    # lesson — no ReusedExchange across clones); a lazy
    # localCheckpoint computes it once. Payload is the distinct
    # path-pair set, the smallest thing all three need.
    body = body.localCheckpoint(eager=False)
    heads = e.select("src", F.col("rel").alias("head"), "dst")

    n_body = body.groupBy("rel1", "rel2").agg(
        F.count(F.lit(1)).alias("n_body")
    )
    head_size = heads.groupBy("head").agg(
        F.count(F.lit(1)).alias("head_size")
    )
    support = (
        body.join(heads, ["src", "dst"])
        .groupBy("rel1", "rel2", "head")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    # PCA denominator: body pairs whose SUBJECT has some head edge
    head_subj = heads.select("head", "src").distinct()
    pca = (
        body.join(head_subj, "src")
        .groupBy("rel1", "rel2", "head")
        .agg(F.count(F.lit(1)).alias("pca_body"))
    )

    out = (
        support.join(n_body, ["rel1", "rel2"])
        .join(head_size, "head")
        .join(pca, ["rel1", "rel2", "head"])
        .select(
            "rel1",
            "rel2",
            "head",
            "support",
            "n_body",
            "head_size",
            F.round(F.col("support") / F.col("head_size"), 9).alias(
                "head_coverage"
            ),
            F.round(F.col("support") / F.col("n_body"), 9).alias(
                "confidence"
            ),
            "pca_body",
            F.round(F.col("support") / F.col("pca_body"), 9).alias(
                "pca_confidence"
            ),
        )
    )
    out = out.filter(F.col("support") >= int(min_support))
    if min_confidence > 0.0:
        out = out.filter(F.col("confidence") >= float(min_confidence))
    return out


def apply_rules(
    edges: DataFrame,
    rules: DataFrame,
    min_pca_confidence: float = 0.0,
    max_fanout: int | None = None,
) -> DataFrame:
    """One forward-chaining step: materialize the conclusions of
    ``rules`` (a :func:`mine_path_rules` output, or any table with
    ``rel1, rel2, head, pca_confidence``) that are NOT already edges.

    Output ``(src, rel, dst, confidence, n_rules)``: ``rel`` is the
    rule head, ``confidence`` = MAX pca_confidence over the rules
    that fired for this conclusion (max, not a noisy-OR product —
    deterministic under any aggregation order), ``n_rules`` = how
    many distinct rules fired. Known ``(src, rel, dst)`` edges leave
    via LEFT ANTI, so the output is exactly the NEW inferences.
    """
    e = edges.select("src", "rel", "dst").distinct()
    body = two_hop_paths(e, max_fanout=max_fanout).select(
        "src", "rel1", "rel2", "dst"
    )
    r = rules.select("rel1", "rel2", "head", "pca_confidence")
    if min_pca_confidence > 0.0:
        r = r.filter(F.col("pca_confidence") >= float(min_pca_confidence))
    fired = body.join(F.broadcast(r), ["rel1", "rel2"]).select(
        "src", F.col("head").alias("rel"), "dst", "pca_confidence"
    )
    concl = fired.groupBy("src", "rel", "dst").agg(
        F.round(F.max("pca_confidence"), 9).alias("confidence"),
        F.count(F.lit(1)).alias("n_rules"),
    )
    return concl.join(e, ["src", "rel", "dst"], "left_anti")
