"""J6/J7 — corpus grounding: candidate entities × web-page mentions,
with explicit skew handling for head entities (north_star: "skew from
head entities handled by salted repartitioning").

The corpus side is huge (100TB of pages); the candidate side is small
(harvested entities) and broadcast. Head entities ("people", "water")
make the per-entity aggregation skewed, so counting is two-phase:
partial counts on (ent, salt=spark_partition_id%K) then final on ent —
no single reducer ever sees a hot entity's full row stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize_corpus(web_pages: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, word) token stream. Lowercased whitespace tokens — matches
    the stub tokenizer used in the beam (shared semantics matter more
    than linguistic finesse here)."""
    return web_pages.select(
        "url", F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    ).filter(F.length("word") > 0)


def corpus_token_ids(web_pages: DataFrame, lm, text_col: str = "text") -> list[int]:
    """LM-token ids whose text occurs as a corpus word — the
    scale-correct way to ground the beam vocabulary: the corpus side
    reduces to DISTINCT words (one shuffle), the LM vocab (≤250k rows)
    broadcasts into a semi join, and only matching token ids come back
    to the driver (≤ vocab_size ints). Feeds
    ``search_ent_tuples(allowed_token_ids=...)``."""
    spark = web_pages.sparkSession
    vocab = [(i, lm.token_text(i).lower()) for i in range(lm.vocab_size)]
    vdf = spark.createDataFrame(vocab, "token_id int, word string").coalesce(1)
    words = tokenize_corpus(web_pages, text_col).select("word").distinct()
    rows = F.broadcast(vdf).join(words, "word", "left_semi").select("token_id").collect()
    return sorted(r["token_id"] for r in rows)


def entity_mentions(
    web_pages: DataFrame,
    entities: DataFrame,
    text_col: str = "text",
    salt_buckets: int = 32,
) -> DataFrame:
    """entities(ent) → (ent, n_docs, n_mentions) over the corpus.

    Single-word entities join the token stream; multi-word entities
    are counted with a substring predicate on the (much rarer) pages
    that contain their first word — the broadcast-join-then-verify
    pattern that avoids scanning full text for every entity."""
    ents = entities.select(F.lower("ent").alias("ent")).distinct().withColumn(
        "first_word", F.split("ent", " ")[0]
    )
    tokens = tokenize_corpus(web_pages, text_col)

    hits = (
        tokens.join(
            F.broadcast(ents), tokens.word == ents.first_word, "inner"
        )
        .join(
            web_pages.select("url", F.lower(text_col).alias("_t")), "url"
        )
        .filter(
            (F.size(F.split("ent", " ")) == 1)
            | F.col("_t").contains(F.col("ent"))
        )
        .select("ent", "url")
    )
    # two-phase salted aggregation (J7): hot entities spread over
    # salt_buckets partial groups before the final combine
    salted = hits.withColumn("salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets)))
    partial = salted.groupBy("ent", "salt").agg(
        F.count(F.lit(1)).alias("m_part"),
        F.approx_count_distinct("url").alias("d_part"),
    )
    return partial.groupBy("ent").agg(
        F.sum("m_part").alias("n_mentions"),
        F.sum("d_part").alias("n_docs_approx"),
    )


def ground_triples(
    triples: DataFrame, web_pages: DataFrame, min_mentions: int = 1
) -> DataFrame:
    """Filter harvested triples to those whose every entity has corpus
    support; attach mention counts."""
    ents = triples.select(F.explode("ents").alias("ent"))
    mentions = entity_mentions(web_pages, ents)
    exploded = triples.select(
        "rel", "ents", "weight", F.explode("ents").alias("ent")
    ).withColumn("ent", F.lower("ent"))
    joined = exploded.join(F.broadcast(mentions), "ent", "left").withColumn(
        "n_mentions", F.coalesce("n_mentions", F.lit(0))
    )
    agg = joined.groupBy("rel", "ents", "weight").agg(
        F.min("n_mentions").alias("min_ent_mentions"),
        F.sum("n_mentions").alias("total_mentions"),
    )
    return agg.filter(F.col("min_ent_mentions") >= min_mentions)
