"""Cross-source triple corroboration — evidence aggregation for
mined knowledge.

A triple asserted by several INDEPENDENT extractors (distinct Hearst
pattern families, Open IE, the MLM harvest, anchor-text dictionaries)
is far more likely true than one a single pattern fired on — the
precision lever WebIsA/Probase pull (per-pattern provenance counts)
and the reason the reference ensembles multiple paraphrased prompts
per relation (`knowledge_harvest/lm.py` weighted prompt ensemble —
same idea, model-side). This operator is the corpus-side twin: fold
per-source triple streams into one evidence row per triple.

Input: ``(subj, rel, obj, source, weight)`` — one row per triple per
source (upstream miners already aggregate within a source).
Output per ``(subj, rel, obj)``:

  * ``n_sources``  — distinct corroborating sources;
  * ``sources``    — the sorted, comma-joined source list (a STRING,
    not an array, so engine-replay comparison and downstream JSON
    sinks are byte-stable);
  * ``total_weight`` — summed support.

Plan shape: ONE hash aggregate, map-side combining — `collect_set`
partials are bounded by the SOURCE COUNT (a handful), never by
corpus size, so a Zipf-headed triple ("cat isa animal" from 10^7
pages) is absorbed per partition like any bounded-state monoid. No
window, no join; min_sources filters AFTER the aggregate (a
HAVING, pushed nowhere because evidence must be complete first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corroborate_triples(
    triples: DataFrame,
    min_sources: int = 1,
) -> DataFrame:
    """Fold per-source triple rows into one evidence row per
    ``(subj, rel, obj)`` with ``n_sources >= min_sources``."""
    out = triples.groupBy("subj", "rel", "obj").agg(
        F.count_distinct("source").alias("n_sources"),
        F.concat_ws(
            ",", F.array_sort(F.collect_set("source"))
        ).alias("sources"),
        F.sum("weight").alias("total_weight"),
    )
    if min_sources > 1:
        out = out.filter(F.col("n_sources") >= min_sources)
    return out
