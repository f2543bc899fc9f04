"""Presentation layer (S6) — the engine's analog of the reference's
``present_result.py:9-56``: per relation, the top-k triples column and
a seeded random sample column, rendered as a plain-text table.

Pure presentation: a TakeOrderedAndProject per relation plus a seeded
``ORDER BY rand(seed)`` sample; the only driver-side work is
formatting the handful of collected rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def summary_frame(triples: DataFrame, top_k: int = 20, sample_k: int = 20,
                  seed: int = 42, pool: int = 200) -> DataFrame:
    """(rel, kind, pos, ents, weight): kind ∈ {top, sample}. The sample
    is drawn from the top-`pool` (reference samples from its top-200
    slice, present_result.py:29-36) with a seeded shuffle."""
    ranked = triples.filter(F.col("rank") <= pool)
    top = (
        ranked.filter(F.col("rank") <= top_k)
        .select(
            "rel", F.lit("top").alias("kind"), F.col("rank").alias("pos"),
            "ents", "weight",
        )
    )
    wrand = W.partitionBy("rel").orderBy(F.rand(seed), F.concat_ws("\x1f", "ents"))
    sample = (
        ranked.withColumn("pos", F.row_number().over(wrand))
        .filter(F.col("pos") <= sample_k)
        .select("rel", F.lit("sample").alias("kind"), "pos", "ents", "weight")
    )
    return top.unionByName(sample)


def render_summary(triples: DataFrame, top_k: int = 20, sample_k: int = 20,
                   seed: int = 42) -> str:
    rows = summary_frame(triples, top_k, sample_k, seed).collect()
    by_rel: dict[str, dict[str, list]] = {}
    for r in rows:
        by_rel.setdefault(r.rel, {"top": [], "sample": []})[r.kind].append(
            (r.pos, list(r.ents), r.weight)
        )
    out = []
    for rel in sorted(by_rel):
        out.append(f"=== {rel} ===")
        out.append(f"{'top-' + str(top_k):40s} | random sample")
        tops = sorted(by_rel[rel]["top"])
        samples = sorted(by_rel[rel]["sample"])
        for i in range(max(len(tops), len(samples))):
            left = ", ".join(tops[i][1]) if i < len(tops) else ""
            right = ", ".join(samples[i][1]) if i < len(samples) else ""
            out.append(f"{left:40s} | {right}")
        out.append("")
    return "\n".join(out)
