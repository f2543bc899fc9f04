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


# Portable word splitter for punct mode: a pure character class, so
# the Java (Spark) and RE2 (DuckDB regexp_split_to_array) engines
# tokenize identically (same compatibility rule as
# textstats.BPE_ISH_PATTERN).
WORD_SPLIT_RE = "[^a-z0-9]+"


def _token_array(text_col: str, word_mode: str):
    """Lowercased token array column. ``space``: whitespace tokens —
    matches the stub tokenizer used in the beam (shared semantics with
    the beam vocabulary matter more than linguistic finesse).
    ``punct``: \\W-aware split, so real-web-text mentions glued to
    punctuation ("dog.", "new york,") still match their entity
    (ADVICE r2: space mode silently misses those)."""
    if word_mode == "space":
        return F.split(F.lower(F.col(text_col)), " ")
    if word_mode == "punct":
        return F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE)
    raise ValueError(f"word_mode must be 'space' or 'punct', got {word_mode!r}")


def tokenize_corpus(
    web_pages: DataFrame, text_col: str = "text", word_mode: str = "space"
) -> DataFrame:
    """(url, word) token stream (see :func:`_token_array` for modes)."""
    return web_pages.select(
        "url", F.explode(_token_array(text_col, word_mode)).alias("word")
    ).filter(F.length("word") > 0)


def tokenize_corpus_with_pos(
    web_pages: DataFrame, text_col: str = "text", word_mode: str = "space"
) -> DataFrame:
    """(url, pos, word) token stream with 0-based RAW array positions
    (empty tokens are dropped AFTER posexplode, so positions stay
    stable under multi-space runs — the DuckDB oracle zips parallel
    UNNESTs the same way)."""
    return web_pages.select(
        "url",
        F.posexplode(_token_array(text_col, word_mode)).alias("pos", "word"),
    ).filter(F.length("word") > 0)


def corpus_token_ids(web_pages: DataFrame, lm, text_col: str = "text") -> list[int]:
    """LM-token ids whose text occurs as a corpus word — the
    scale-correct way to ground the beam vocabulary: the corpus side
    reduces to DISTINCT words (one shuffle), the LM vocab (≤250k rows)
    broadcasts into a semi join, and only matching token ids come back
    to the driver (≤ vocab_size ints). The vocab table reads the
    per-instance ``lm.vocab_texts()`` cache — one full-vocab decode
    scan per (model, seed) per driver process, however many grounding
    jobs run (VERDICT r2 item 4). Feeds
    ``search_ent_tuples(allowed_token_ids=...)``."""
    spark = web_pages.sparkSession
    vdf = _vocab_df(spark, lm)
    words = tokenize_corpus(web_pages, text_col).select("word").distinct()
    rows = F.broadcast(vdf).join(words, "word", "left_semi").select("token_id").collect()
    return sorted(r["token_id"] for r in rows)


def _vocab_df(spark, lm) -> DataFrame:
    """(token_id, word) table from the per-instance vocab-text cache.
    Token texts are TRIMMED before matching: byte-BPE word-initial
    tokens decode with a leading space (``Ġdog`` → ``" dog"``), and
    without the trim every word-start token of a roberta-style backend
    would silently fail to match its corpus word, leaving grounding to
    continuation pieces only. Shared by the global and per-relation
    grounding paths so the matching semantics cannot diverge."""
    vocab = list(enumerate(lm.vocab_texts()))
    return (
        spark.createDataFrame(vocab, "token_id int, word string")
        .select("token_id", F.trim("word").alias("word"))
        .coalesce(1)
    )


def _seed_words(relations: DataFrame, word_mode: str) -> DataFrame:
    """(rel, word) distinct seed-entity words, tokenized with the SAME
    word mode as the corpus (punctuated seeds match in punct mode)."""
    seed_text = F.lower(F.regexp_replace("seed", "_", " "))
    seed_words = (
        F.split(seed_text, " ")
        if word_mode == "space"
        else F.split(seed_text, WORD_SPLIT_RE)
    )
    return (
        relations.select("rel", F.explode("seed_ent_tuples").alias("tup"))
        .select("rel", F.explode("tup").alias("seed"))
        .select("rel", F.explode(seed_words).alias("word"))
        .filter(F.length("word") > 0)
        .distinct()
    )


def relation_word_cooccurrence(
    web_pages: DataFrame,
    relations: DataFrame,
    text_col: str = "text",
    word_mode: str = "space",
    cooccur_window: int | None = None,
    restrict_words: DataFrame | None = None,
) -> DataFrame:
    """(rel, word) distinct corpus words attested NEAR a seed-entity
    word of the relation. ``cooccur_window=None`` → page-level
    co-occurrence (any word on a page that mentions a seed word);
    ``cooccur_window=k`` → only words within ±k raw token positions of
    a seed-word occurrence (ROADMAP r3 refinement: same-page grounding
    admits words from unrelated paragraphs of long pages; a window
    scopes the vocabulary to local context).

    Scale shape (100 TB): the token stream is built once and cached
    across both joins; seed words broadcast. In window mode the
    position filter runs only over HIT pages (pages carrying a seed
    word), and the per-page pair volume is |seed hits| × |page words|
    — bounded by page length, never corpus-quadratic. The result is
    eager-checkpointed so the stream cache can be released without the
    caller recomputing it; callers that only need a bounded subset of
    the vocabulary (e.g. LM-vocab grounding) pass ``restrict_words``
    (a small (word) table, broadcast-joined BEFORE the checkpoint) so
    the materialized set is restriction-bounded, not corpus-bounded."""
    seeds = _seed_words(relations, word_mode)

    def _bounded(out: DataFrame) -> DataFrame:
        if restrict_words is not None:
            out = out.join(
                F.broadcast(restrict_words.select("word").distinct()), "word"
            )
        return out.select("rel", "word").distinct().localCheckpoint(eager=True)

    if cooccur_window is None:
        toks = tokenize_corpus(web_pages, text_col, word_mode).cache()
        try:
            hit_pages = toks.join(F.broadcast(seeds), "word").select(
                "rel", "url"
            ).distinct()
            return _bounded(toks.join(hit_pages, "url"))
        finally:
            toks.unpersist()
    w = int(cooccur_window)
    ptoks = tokenize_corpus_with_pos(web_pages, text_col, word_mode).cache()
    try:
        hits = ptoks.join(F.broadcast(seeds), "word").select(
            "rel", "url", F.col("pos").alias("seed_pos")
        ).distinct()
        return _bounded(
            ptoks.join(hits, "url").filter(
                (F.col("pos") >= F.col("seed_pos") - w)
                & (F.col("pos") <= F.col("seed_pos") + w)
            )
        )
    finally:
        ptoks.unpersist()


def corpus_token_ids_per_relation(
    web_pages: DataFrame,
    relations: DataFrame,
    lm,
    text_col: str = "text",
    word_mode: str = "space",
    cooccur_window: int | None = None,
) -> dict[str, list[int]]:
    """rel → LM-token ids attested on pages that mention ANY of the
    relation's seed entities — a tighter beam grounding than the
    global ``corpus_token_ids`` (ROADMAP r3 item: a head relation's
    candidates shouldn't include words only ever seen on unrelated
    pages).

    Scale shape (100 TB): the (url, word) token stream is built once
    and CACHED across its two joins — the seed-word broadcast join
    that finds hit pages (map-side) and the hit-url join that
    collects their word sets (at full scale, write the tokenized
    corpus once instead; it is consumed by every grounding/mention
    operator). Seed entities are tokenized with the SAME ``word_mode``
    as the corpus, so punctuated seeds ("o'clock") match in punct
    mode instead of silently grounding to nothing. The returned
    driver object is ≤ |rels| × vocab ints, bounded by harvest
    config, not the corpus. ``cooccur_window=k`` restricts each
    relation's vocabulary to words within ±k token positions of a
    seed-word occurrence (default: whole hit page) — see
    :func:`relation_word_cooccurrence`."""
    spark = web_pages.sparkSession
    vdf = _vocab_df(spark, lm)
    # restrict to LM-vocab words BEFORE the checkpoint inside the
    # helper: the materialized set stays ≤ |rels| × vocab, not
    # |rels| × corpus vocabulary (review r3 finding)
    rel_words = relation_word_cooccurrence(
        web_pages, relations, text_col, word_mode, cooccur_window,
        restrict_words=vdf,
    )
    rows = (
        rel_words.join(F.broadcast(vdf), "word")
        .select("rel", "token_id")
        .collect()
    )
    out: dict[str, list[int]] = {}
    for r in rows:
        out.setdefault(r["rel"], []).append(r["token_id"])
    return {rel: sorted(ids) for rel, ids in out.items()}


def _entity_word_lengths(ents: DataFrame) -> list[int]:
    """Distinct word counts among the entities — the n-gram lengths the
    phrase stream must generate. The entity table is the small
    (broadcastable) side, so this driver collect is bounded."""
    return sorted(
        r["L"]
        for r in ents.select(F.size(F.split("ent", " ")).alias("L")).distinct().collect()
    )


def phrase_stream(
    web_pages: DataFrame, lengths: list[int], text_col: str = "text",
    word_mode: str = "space",
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
    toks = F.filter(_token_array(text_col, word_mode), lambda w: F.length(w) > 0)
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
    word_mode: str = "space",
) -> DataFrame:
    """entities(ent) → (ent, n_mentions, n_docs) over the corpus in a
    SINGLE pass: the scan projects token n-grams for every entity
    word-length, broadcast-joins the entity table (map-side, no corpus
    shuffle), and aggregates with the url-hash salt. The only data
    ever shuffled is (ent, salt) partial counts. Use
    ``word_mode='punct'`` when grounding real web text (mentions glued
    to punctuation count); ``space`` keeps stub-beam-vocabulary
    parity."""
    ents = entities.select(F.lower("ent").alias("ent")).distinct()
    lengths = _entity_word_lengths(ents)
    if not lengths:
        return web_pages.sparkSession.createDataFrame(
            [], "ent string, n_mentions long, n_docs long"
        )
    hits = (
        phrase_stream(web_pages, lengths, text_col, word_mode)
        .join(F.broadcast(ents), F.col("phrase") == F.col("ent"))
        .select("ent", "url")
    )
    return _mention_counts(hits, salt_buckets)


def entity_mentions_salted_join(
    web_pages: DataFrame,
    entities: DataFrame,
    text_col: str = "text",
    salt_buckets: int = 16,
    word_mode: str = "space",
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
    probe = phrase_stream(web_pages, lengths, text_col, word_mode).withColumn(
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
