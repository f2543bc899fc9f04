"""DIRT-style relation-paraphrase discovery over mined triples.

Two relation phrases that hold between the same argument pairs are
paraphrases — Lin & Pantel's DIRT (2001), the corpus-side twin of the
reference's LLM-generated prompt paraphrases
(`knowledge_harvest/search_prompts.py`, S10): where the reference
asks a model for alternative phrasings of a seed prompt, a web-scale
deployment can READ them off the corpus — "X married Y" and
"X wed Y" share argument pairs, so "wed" joins the relation's prompt
ensemble with a measured (not asserted) confidence.

Contract: candidate pair sets are the DISTINCT (subj, obj) pairs per
predicate; similarity = Jaccard overlap of those sets (symmetric, so
one canonical orientation ``pred_a < pred_b``); ``min_overlap``
gates output.

Plan shape — the scale decisions:

* The self-join is EQUI on the (subj, obj) argument-pair key — never
  a predicate × predicate product. Join volume per argument pair is
  quadratic in the predicates sharing THAT pair, which is
  grammar-bounded on real text (a handful of verbs per entity pair);
  a viral argument pair is ordinary equi-join skew (AQE splits it).
* ``pred_a < pred_b`` rides IN the join condition, so each unordered
  pair materializes once and self-pairs never exist.
* Overlap and per-predicate set sizes are map-side-combining
  aggregates; the final score joins two |predicates|-row tables onto
  the overlap table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discover_inverses(
    triples: DataFrame,
    min_overlap: int = 1,
) -> DataFrame:
    """``(pred_a, pred_b, overlap, jaccard, symmetric)`` — predicate
    pairs whose argument-pair sets are SWAPS of each other: ``A`` and
    ``B`` are inverses when ``(s, o) ∈ pairs(A)`` tends to imply
    ``(o, s) ∈ pairs(B)`` ("acquired" / "sold_to", "parent_of" /
    "child_of"). The ``pred_a == pred_b`` diagonal measures SYMMETRY
    ("married", "adjacent_to" — their own inverse), flagged
    ``symmetric``. The schema-alignment twin of
    :func:`discover_paraphrases`: paraphrases collapse surface forms,
    inverses orient them — both feed predicate canonicalization so
    "X acquired Y" and "Y sold_to X" pool evidence instead of
    splitting it.

    Contract: ``overlap = |pairs(A) ∩ swap(pairs(B))|`` over DISTINCT
    (subj, obj) pairs per predicate; ``jaccard = overlap /
    (|A| + |B| - overlap)`` (for the diagonal this is the fraction of
    pairs whose reverse is also asserted); one canonical orientation
    ``pred_a <= pred_b``.

    Plan shape: identical to :func:`discover_paraphrases` — the
    self-join is EQUI on the swapped argument-pair key
    ``(a.subj, a.obj) == (b.obj, b.subj)``, never a predicate
    product; sizes join on two |predicates|-row tables. The diagonal
    needs no special casing: for ``A == B`` each element of
    ``pairs(A) ∩ swap(pairs(A))`` matches exactly once (the swapped
    row is a DIFFERENT distinct row unless ``subj == obj``, which
    matches itself), so the count IS the set-intersection size."""
    t = triples.select("subj", "pred", "obj").distinct()
    a, b = t.alias("a"), t.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("a.subj") == F.col("b.obj"))
            & (F.col("a.obj") == F.col("b.subj"))
            & (F.col("a.pred") <= F.col("b.pred")),
        )
        .groupBy(
            F.col("a.pred").alias("pred_a"), F.col("b.pred").alias("pred_b")
        )
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    if min_overlap > 1:
        overlap = overlap.filter(F.col("overlap") >= min_overlap)
    sizes = t.groupBy("pred").agg(F.count(F.lit(1)).alias("sz"))
    return (
        overlap.join(
            sizes.select(F.col("pred").alias("pred_a"), F.col("sz").alias("sz_a")),
            "pred_a",
        )
        .join(
            sizes.select(F.col("pred").alias("pred_b"), F.col("sz").alias("sz_b")),
            "pred_b",
        )
        .select(
            "pred_a",
            "pred_b",
            "overlap",
            (
                F.col("overlap")
                / (F.col("sz_a") + F.col("sz_b") - F.col("overlap"))
            ).alias("jaccard"),
            (F.col("pred_a") == F.col("pred_b")).alias("symmetric"),
        )
    )


def discover_paraphrases(
    triples: DataFrame,
    min_overlap: int = 1,
) -> DataFrame:
    """``(pred_a, pred_b, overlap, jaccard)`` over mined triples
    ``(subj, pred, obj, ...)``: predicates ranked by argument-pair
    set overlap, ``pred_a < pred_b``."""
    t = triples.select("subj", "pred", "obj").distinct()
    a, b = t.alias("a"), t.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("a.subj") == F.col("b.subj"))
            & (F.col("a.obj") == F.col("b.obj"))
            & (F.col("a.pred") < F.col("b.pred")),
        )
        .groupBy(
            F.col("a.pred").alias("pred_a"), F.col("b.pred").alias("pred_b")
        )
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    if min_overlap > 1:
        overlap = overlap.filter(F.col("overlap") >= min_overlap)
    sizes = t.groupBy("pred").agg(F.count(F.lit(1)).alias("sz"))
    out = (
        overlap.join(
            sizes.select(F.col("pred").alias("pred_a"), F.col("sz").alias("sz_a")),
            "pred_a",
        )
        .join(
            sizes.select(F.col("pred").alias("pred_b"), F.col("sz").alias("sz_b")),
            "pred_b",
        )
        .select(
            "pred_a",
            "pred_b",
            "overlap",
            (
                F.col("overlap")
                / (F.col("sz_a") + F.col("sz_b") - F.col("overlap"))
            ).alias("jaccard"),
        )
    )
    return out
