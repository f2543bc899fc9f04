"""KG-completion evaluation — filtered ranking metrics (MRR,
Hits@k) over scored candidate tables.

The reference stops at emitting ranked triples
(`knowledge_harvest/lm.py` ent_tuples); a production KG pipeline
closes the loop by MEASURING its completion layer (q115's PRA
scores, any embedding model trained on q116's negatives) with the
link-prediction protocol every KG-embedding paper uses (Bordes et
al. 2013 TransE, and the "filtered" setting that removes other
known-true triples from the ranking): for each held-out test triple
(subj, pred, obj), rank the true object among the scored candidate
objects for that (subj, pred) query, skipping candidates that are
themselves known-true elsewhere in the graph; report MRR and
Hits@k.

Plan shapes — the scale decisions:

* The rank is NEVER a window over the candidate table. A global (or
  even per-query) ``row_number`` sorts every candidate list end to
  end; with 10^7 queries x 10^4 candidates that is the hot-key sort
  this repo designs out everywhere (q51's min(struct), q83's
  top-n-first). Instead rank = 1 + COUNT of candidates that BEAT
  the true object — one equi-join of candidates onto test triples
  keyed by (subj, pred) followed by a conditional aggregate with
  map-side partials. Bounded state per key, no sort anywhere.
* "Beats" is a total order: higher score wins, ties break by the
  candidate string ascending (smaller string ranks ahead). The
  tiebreak makes the rank a pure function of the table contents —
  shuffle order, AQE, and engine cannot move it (the q106/q111
  determinism contract).
* The filtered setting drops known-true competitors BEFORE the
  count via LEFT ANTI on (subj, pred, candidate) — the anti-join
  routes through the same (subj, pred) shuffle the rank join needs,
  so filtering costs no extra exchange shape.
* ``ranking_metrics`` folds ranks into one row of count-monoid
  partials (n, sum 1/rank, sum[rank<=k]) — a single map-side
  combining aggregate; 1/rank quantizes to round(., 9) so the MRR
  mean re-aggregates identically across partitionings and engines.

Reference parity anchor: the reference's own evaluation
(`knowledge_harvest/evaluate.py`-style P/R vs golden ent_tuples) is
J5 (`plans/evaluation.py`); this module is the completion-layer
counterpart the north-star's "calibrated confidence" edges need.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filtered_ranks(
    candidates: DataFrame,
    test: DataFrame,
    known: DataFrame | None = None,
) -> DataFrame:
    """Per-test-triple filtered rank of the true object.

    Parameters
    ----------
    candidates : (subj, pred, obj, score) — scored candidate objects
        per (subj, pred) query (e.g. q115's ``pra_score`` output
        re-keyed, or an embedding scorer's top pool). Duplicate
        (subj, pred, obj) rows collapse to their MAX score first, so
        upstream unions can't double-count a competitor.
    test : (subj, pred, obj) — held-out true triples to evaluate.
    known : (subj, pred, obj) or None — triples treated as known-true
        and therefore REMOVED from each ranking (the "filtered"
        protocol). The test triple itself never competes with itself
        regardless (the true object is excluded from the competitor
        count by construction).

    Returns ``(subj, pred, obj, true_score, rank)``. Test triples
    whose true object is absent from the candidate table get
    ``true_score`` NULL and ``rank`` NULL — the caller decides the
    penalty (``ranking_metrics`` counts them as misses for every k,
    the strict convention). ``rank`` = 1 + number of surviving
    competitors with (score > true_score) OR (score == true_score
    AND candidate < true_obj) — a deterministic total order.
    """
    cand = (
        candidates.select("subj", "pred", "obj", "score")
        .groupBy("subj", "pred", "obj")
        .agg(F.max("score").alias("score"))
    )
    t = test.select("subj", "pred", "obj").distinct()
    if known is not None:
        k = known.select("subj", "pred", "obj").distinct()
        # keep a candidate row only while it is NOT a known triple;
        # the test triple's own row is re-attached via the true-score
        # lookup below, so filtering it here is harmless even when
        # test ⊆ known (the usual split).
        cand = cand.join(k, ["subj", "pred", "obj"], "left_anti")
    true_score = t.join(
        candidates.groupBy("subj", "pred", "obj").agg(
            F.max("score").alias("true_score")
        ),
        ["subj", "pred", "obj"],
        "left",
    )
    competitors = cand.select(
        "subj",
        "pred",
        F.col("obj").alias("_cand"),
        F.col("score").alias("_cscore"),
    )
    joined = true_score.join(competitors, ["subj", "pred"], "left")
    beats = (
        (F.col("_cand") != F.col("obj"))
        & (
            (F.col("_cscore") > F.col("true_score"))
            | (
                (F.col("_cscore") == F.col("true_score"))
                & (F.col("_cand") < F.col("obj"))
            )
        )
    ).cast("int")
    return (
        joined.groupBy("subj", "pred", "obj", "true_score")
        .agg(F.sum(beats).alias("_nbeat"))
        .select(
            "subj",
            "pred",
            "obj",
            "true_score",
            F.when(
                F.col("true_score").isNotNull(),
                (F.coalesce(F.col("_nbeat"), F.lit(0)) + 1).cast("bigint"),
            ).alias("rank"),
        )
    )


def ranking_metrics(
    ranks: DataFrame, ks: Sequence[int] = (1, 3, 10)
) -> DataFrame:
    """One-row summary over :func:`filtered_ranks` output:
    ``(n, mrr, hits_1, hits_3, hits_10, ...)``. NULL ranks (true
    object unscored) count in ``n`` and as misses at every k —
    strict, the convention that keeps a scorer from gaming metrics
    by refusing to score hard queries. Reciprocal ranks quantize to
    round(1/rank, 9) before the mean so the sum is order-stable."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(
                F.coalesce(F.round(1.0 / F.col("rank"), 9), F.lit(0.0))
            )
            / F.count(F.lit(1)),
            9,
        ).alias("mrr"),
    ]
    for k in ks:
        aggs.append(
            F.round(
                F.sum(
                    F.when(F.col("rank") <= k, 1).otherwise(0)
                )
                / F.count(F.lit(1)),
                9,
            ).alias(f"hits_{k}")
        )
    return ranks.agg(*aggs)
