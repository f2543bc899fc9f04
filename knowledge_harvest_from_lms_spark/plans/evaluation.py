"""Ranked-triple evaluation harness (J5; north rule: P/R >= 0.95 vs
the reference's emitted ranked triple lists).

Compares two ranked triple sets per relation at top-k:
  precision = |produced∩golden| / |produced|
  recall    = |produced∩golden| / |golden|

`load_golden_ent_tuples` reads the reference's published
results/**/ent_tuples.json format ([[ents..., weight]] sorted desc,
reference ``main.py:59-61``) when such files are available; in this
sandbox the sequential spec plays the golden role (tests assert
P/R == 1.0 against it, a stronger bar).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_golden_ent_tuples(
    spark: SparkSession, result_dir: str, rels: list[str]
) -> DataFrame:
    """result_dir/<rel>/ent_tuples.json → (rel, ents, weight, rank)."""
    rows = []
    for rel in rels:
        path = os.path.join(result_dir, rel, "ent_tuples.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        for rank, (ents, weight) in enumerate(data, start=1):
            rows.append((rel, [str(e) for e in ents], float(weight), rank))
    return spark.createDataFrame(
        rows, "rel string, ents array<string>, weight double, rank int"
    )


def precision_recall_at_k(
    produced: DataFrame, golden: DataFrame, k: int = 100
) -> DataFrame:
    """Per-relation P/R@k. Tuples compared case-insensitively on the
    joined entity key (the casing-variant argmax is scoring detail,
    not knowledge content)."""
    key = F.lower(F.concat_ws("\x1f", "ents"))
    p = produced.filter(F.col("rank") <= k).select(
        "rel", key.alias("k")
    ).dropDuplicates()
    g = golden.filter(F.col("rank") <= k).select(
        "rel", key.alias("k")
    ).dropDuplicates()
    inter = p.join(g, ["rel", "k"]).groupBy("rel").agg(
        F.count(F.lit(1)).alias("n_inter")
    )
    np_ = p.groupBy("rel").agg(F.count(F.lit(1)).alias("n_prod"))
    ng = g.groupBy("rel").agg(F.count(F.lit(1)).alias("n_gold"))
    return (
        np_.join(ng, "rel", "full")
        .join(inter, "rel", "left")
        .fillna(0, ["n_inter"])
        .withColumn("precision", F.round(F.col("n_inter") / F.col("n_prod"), 4))
        .withColumn("recall", F.round(F.col("n_inter") / F.col("n_gold"), 4))
    )
