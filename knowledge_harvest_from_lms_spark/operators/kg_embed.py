"""KG-embedding training (TransE, Bordes et al. NeurIPS'13) as a
pure Spark dataflow — deterministic init, full-batch margin-loss
subgradient steps, and bit-stable training that two engines (or two
cluster sizes, or a retried stage) replay IDENTICALLY.

The reference ranks harvested triples but never learns from them;
the canonical downstream consumer of a harvested KG is an embedding
model (TransE/DistMult family) whose scores drive the link-prediction
eval already in this repo (`operators/kg_eval.py`, q117) and whose
training pairs come from `operators/kg_complete.py::negative_samples`
(q116). This module closes that loop: entities and relations embed in
R^d, score(h, r, t) = ||h + r - t||₂², and a margin ranking loss over
(positive, corrupted) pairs trains by full-batch subgradient descent.

Why full-batch + fixed-point, not mini-batch SGD: SGD's result
depends on visit ORDER — the one thing a distributed engine must not
promise (AQE re-plans, retries re-execute, cluster size changes the
partitioning). Training as Spark dataflow is only reproducible if
every aggregation is order-free, so:

* per-pair gradient contributions QUANTIZE to BIGINT fixed point
  (``round(g * grad_scale)``) before summing — integer addition is
  associative-commutative, so the gradient sum is exact under any
  shuffle order, partitioning, or engine (the q111 truth-finding
  contract applied to learning);
* the parameter update is then ONE float expression per coordinate,
  ``v - lr * (q / grad_scale)``, identical IEEE ops on identical
  inputs everywhere;
* init is the portable avalanche hash (`sketches.kmv_hash`) of
  ``id|dim_index`` — no RNG state, replayable in ANSI SQL (q116's
  oracle pattern), so step 0 is already cross-engine-identical.

Plan shapes — the scale decisions:

* Embeddings live as ``(id, emb: array<double>)`` — ONE row per
  entity/relation. The train step joins the pair table to this table
  four times (subj/pred/obj/neg_obj roles) on the narrow ``id`` key;
  all per-dimension math (h + r − t, squared distances, subgradient
  arrays) runs as JVM higher-order functions (``zip_with`` /
  ``transform`` / ``aggregate``) INSIDE the row — no per-dimension
  join, no Python, no explode on the compute path.
* The only explode is at the gradient-aggregation boundary:
  ``posexplode`` to ``(id, i, q)`` feeding a hash aggregate whose
  map-side partials absorb hub entities (the head entity appearing
  in 10^6 pairs collapses per partition before the shuffle).
* Re-assembly sorts each id's ≤ d coordinate rows with
  ``array_sort(collect_list(struct(i, q)))`` — bounded by dim, and
  deterministic BY KEY (collect_list order never matters).
* Inactive pairs (margin satisfied) are FILTERED before any gradient
  work — late in training that is most of the batch.

Cite: reference `knowledge_harvest/` has no training stage; this is
net-new engine surface grounded in the public TransE paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import _M, kmv_hash

#: fixed-point scale for gradient quantization: 1e6 keeps per-pair
#: contributions exact to a millionth while a 2^63 BIGINT sum
#: tolerates ~9e12 pairs per coordinate before overflow
GRAD_SCALE = 1_000_000


def init_embeddings(
    ids: DataFrame,
    dim: int,
    seed: int = 0,
    scale: float | None = None,
) -> DataFrame:
    """Deterministic embedding init: ``(id, emb: array<double>)``
    with ``emb[i] = (hash(id|i) / M) * 2*scale - scale`` — uniform in
    [-scale, scale) per the TransE recipe (default ``scale`` =
    6/sqrt(dim), the paper's Xavier-style bound). The hash is the
    portable avalanche (`sketches.kmv_hash`), so init replays in
    ANSI SQL and never depends on an RNG, a partition order, or a
    cluster size. ``ids`` must carry one ``id`` column; entities and
    relations share the table (prefix ids to avoid collisions)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    s = float(scale) if scale is not None else 6.0 / float(dim) ** 0.5

    def _coord(i: Column) -> Column:
        h = kmv_hash(
            F.concat(F.col("id"), F.lit("|"), i.cast("string")), seed
        )
        return (h.cast("double") / F.lit(float(_M))) * F.lit(
            2.0 * s
        ) - F.lit(s)

    return ids.select(
        "id",
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _coord).alias(
            "emb"
        ),
    )


def _l2sq(v: Column) -> Column:
    """Σ v_i² folded in array-index order — both engines reduce
    left-to-right, so the float sum is IEEE-identical."""
    return F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x * x
    )


def _quant(x: Column) -> Column:
    return F.round(x * F.lit(float(GRAD_SCALE)), 0).cast("bigint")


def transe_step(
    emb: DataFrame,
    pairs: DataFrame,
    lr: float = 0.01,
    margin: float = 1.0,
) -> DataFrame:
    """One full-batch TransE subgradient step; returns the updated
    ``(id, emb)`` table.

    ``pairs`` carries ``(subj, pred, obj, neg_obj)`` — e.g. the
    output of `kg_complete.negative_samples` renamed. For each pair
    with ``margin + ||h+r-t||² - ||h+r-t'||² > 0`` (the active set),
    the L2² subgradients are

        ∂/∂h = ∂/∂r = 2(dp - dn),   ∂/∂t = -2 dp,   ∂/∂t' = 2 dn

    with ``dp = h+r-t``, ``dn = h+r-t'``. Contributions quantize to
    BIGINT fixed point per coordinate BEFORE the order-free integer
    sum; ids absent from ``pairs`` (or only in inactive pairs) keep
    their embeddings unchanged. Inner joins on the four roles mean a
    pair referencing an id missing from ``emb`` is dropped — init
    over the union of all ids first."""

    def _role(col: str, as_: str) -> DataFrame:
        return emb.select(
            F.col("id").alias(col), F.col("emb").alias(as_)
        )

    p = (
        pairs.select("subj", "pred", "obj", "neg_obj")
        .join(_role("subj", "h"), "subj")
        .join(_role("pred", "r"), "pred")
        .join(_role("obj", "t"), "obj")
        .join(_role("neg_obj", "tn"), "neg_obj")
    )
    hr = F.zip_with("h", "r", lambda a, b: a + b)
    p = p.select(
        "subj",
        "pred",
        "obj",
        "neg_obj",
        F.zip_with(hr, "t", lambda a, b: a - b).alias("dp"),
        F.zip_with(hr, "tn", lambda a, b: a - b).alias("dn"),
    )
    active = p.filter(
        F.lit(float(margin)) + _l2sq(F.col("dp")) - _l2sq(F.col("dn"))
        > 0
    )
    # per-pair quantized subgradients, one (id, gq) row per role;
    # ∂t / ∂t' negate AFTER quantization so both engines negate the
    # same integer
    g_hr = F.zip_with(
        "dp", "dn", lambda a, b: _quant(F.lit(2.0) * (a - b))
    )
    g_t = F.transform("dp", lambda x: -_quant(F.lit(2.0) * x))
    g_tn = F.transform("dn", lambda x: _quant(F.lit(2.0) * x))
    contrib = (
        active.select(F.col("subj").alias("id"), g_hr.alias("gq"))
        .unionAll(active.select(F.col("pred").alias("id"), g_hr.alias("gq")))
        .unionAll(active.select(F.col("obj").alias("id"), g_t.alias("gq")))
        .unionAll(
            active.select(F.col("neg_obj").alias("id"), g_tn.alias("gq"))
        )
    )
    grads = (
        contrib.select("id", F.posexplode("gq").alias("i", "q"))
        .groupBy("id", "i")
        .agg(F.sum("q").alias("q"))
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("i", "q"))).alias("gs")
        )
        .select("id", F.transform("gs", lambda s: s["q"]).alias("g"))
    )
    upd = F.zip_with(
        "emb",
        "g",
        lambda v, q: v
        - F.lit(float(lr))
        * (q.cast("double") / F.lit(float(GRAD_SCALE))),
    )
    return emb.join(grads, "id", "left").select(
        "id",
        F.when(F.col("g").isNull(), F.col("emb"))
        .otherwise(upd)
        .alias("emb"),
    )


def transe_distance(emb: DataFrame, triples: DataFrame) -> DataFrame:
    """Score triples under the trained embeddings:
    ``(subj, pred, obj, dist)`` with ``dist = ||h + r - t||₂²``
    (LOWER is better). Triples referencing unembedded ids drop via
    the inner joins."""

    def _role(col: str, as_: str) -> DataFrame:
        return emb.select(
            F.col("id").alias(col), F.col("emb").alias(as_)
        )

    p = (
        triples.select("subj", "pred", "obj")
        .join(_role("subj", "h"), "subj")
        .join(_role("pred", "r"), "pred")
        .join(_role("obj", "t"), "obj")
    )
    hr = F.zip_with("h", "r", lambda a, b: a + b)
    return p.select(
        "subj",
        "pred",
        "obj",
        _l2sq(F.zip_with(hr, "t", lambda a, b: a - b)).alias("dist"),
    )
