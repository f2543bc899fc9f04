"""Custom stateful streaming operator (SURVEY.md §2.9 extension;
driver brief: "applyInPandasWithState for custom stateful operators").

``streaming_mention_counts`` keeps a per-entity running total of
corpus mentions across micro-batches: token unigrams from each page
drop are matched against the (small) entity set JVM-side, then a
grouped ``applyInPandasWithState`` accumulates (n_mentions, n_batches)
per entity and emits the UPDATED totals each trigger — the streaming
analog of ``operators/corpus_grounding.entity_mentions``.

Scale shape: the per-group state is two longs; the grouped shuffle is
on `ent` (the entity set is small by construction — harvested
entities), so state never grows with the corpus. Late data beyond the
watermark is dropped by the upstream ingest, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("ent", T.StringType()),
        T.StructField("n_mentions", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_mentions", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)


def _update_counts(key, pdf_iter, state: GroupState):
    import pandas as pd

    total = 0
    for pdf in pdf_iter:
        total += int(pdf["n"].sum())
    if state.exists:
        prev_mentions, prev_batches = state.get
    else:
        prev_mentions, prev_batches = 0, 0
    new_mentions = prev_mentions + total
    new_batches = prev_batches + 1
    state.update((new_mentions, new_batches))
    yield pd.DataFrame(
        {"ent": [key[0]], "n_mentions": [new_mentions], "n_batches": [new_batches]}
    )


def streaming_mention_counts(
    pages_stream: DataFrame, entities: DataFrame, text_col: str = "text"
) -> DataFrame:
    """pages stream (url, text, ...) × static entities(ent) →
    streaming (ent, n_mentions, n_batches) with running totals.

    The static entity side broadcast-joins the page stream's n-gram
    phrase stream (same generator as the batch operator, so multi-word
    entities count identically; stream-static joins are stateless);
    only matched (ent, count) partials reach the stateful operator."""
    from ..operators.corpus_grounding import (
        _entity_word_lengths,
        phrase_stream,
    )

    ents = entities.select(F.lower("ent").alias("ent")).distinct()
    lengths = _entity_word_lengths(ents)  # static side: driver-safe
    phrases = phrase_stream(
        pages_stream.select("url", F.col(text_col)), lengths or [1], text_col
    )
    matched = phrases.join(
        F.broadcast(ents), phrases.phrase == ents.ent
    ).select("ent", F.lit(1).alias("n"))
    return matched.groupBy("ent").applyInPandasWithState(
        _update_counts,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
