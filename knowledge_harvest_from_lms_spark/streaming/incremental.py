"""Incremental harvest support: streaming corpus grounding.

New crawl drops arrive as a stream; harvested triples are a static
(small) table. Per micro-batch we update per-entity running mention
totals through the stateful operator (`streaming/stateful.py`) and
upsert them into a parquet totals table via foreachBatch — the
standard streaming-upsert + batch-view pattern (Iceberg MERGE INTO in
production; idempotent overwrite-by-entity here). `grounded_view`
then answers "which triples have corpus support ≥ k AS OF the pages
seen so far" without ever rescanning old drops.

Scale shape: state and the totals table are keyed by harvested
entities (≤ rels × max_n_ent_tuples × arity — bounded by harvest
config, NOT by the corpus), so the upsert is small however many pages
stream through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import hadoop_delete, hadoop_exists, stage_overwrite
from .stateful import streaming_mention_counts


def triple_entities(triples: DataFrame) -> DataFrame:
    return triples.select(
        F.explode("ents").alias("ent")
    ).select(F.lower("ent").alias("ent")).distinct()


def _changed_path(totals_path: str) -> str:
    return totals_path.rstrip("/") + ".changed"


def start_incremental_grounding(
    spark: SparkSession,
    pages_stream: DataFrame,
    triples: DataFrame,
    totals_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    track_changes: bool = False,
    txn: bool = False,
):
    """Start (availableNow) the totals-upsert stream; returns the
    StreamingQuery. Totals are ABSOLUTE running counts (the stateful
    operator carries them), so the upsert is idempotent: replace each
    emitted entity's row, keep the rest.

    ``track_changes=True`` additionally appends each batch's touched
    entities to ``<totals>.changed`` — the delta feed that lets
    ``incremental_rerank`` re-rank ONLY relations whose corpus support
    moved, instead of rescoring the whole triple table per drop.

    ``txn=True`` makes ``totals_path`` a :class:`~..txn.TxnLog` root:
    the merged ``totals`` overwrite and the batch's ``changed``-entity
    append become ONE commit. The plain layout promotes totals and
    then appends the delta feed as two separate writes, so a crash
    between them persists the new totals while LOSING the delta — the
    affected relations would keep their stale ranking until some other
    change touched them; the log closes that window (and a crash
    before the commit replays the batch against the previous
    snapshot, idempotently). Consumers read via
    ``TxnLog(sess, totals_path).read("totals")`` and consume the
    ``changed`` table by CDC (``incremental_rerank_txn``) instead of
    a delete-after-read feed."""
    counts = streaming_mention_counts(pages_stream, triple_entities(triples), text_col)

    def upsert(batch_df, _bid):
        sess = batch_df.sparkSession
        batch_df = batch_df.coalesce(1)
        if txn:
            from ..txn import TxnLog

            log = TxnLog(sess, totals_path)
            if log.has_table("totals"):
                old = log.read("totals")
                merged = old.join(
                    batch_df.select("ent"), "ent", "left_anti"
                ).unionByName(batch_df)
            else:
                merged = batch_df
            log.commit(
                overwrites={"totals": merged},
                appends={"changed": batch_df.select("ent").coalesce(1)},
                meta={"batch_id": int(_bid)},
            )
            return
        # existence via the Hadoop FileSystem API (fsutil), NOT
        # driver-local os.path (totals_path may be s3a://... /
        # hdfs://...) and NOT a bare try/except around the read: a
        # transient read failure (storage hiccup, corrupt footer) must
        # propagate so the streaming query retries the batch, instead
        # of being mistaken for "table does not exist" and silently
        # wiping the accumulated totals with only this batch's
        # entities.
        if hadoop_exists(sess, totals_path):
            old = sess.read.parquet(totals_path)
            merged = old.join(batch_df.select("ent"), "ent", "left_anti").unionByName(
                batch_df
            )
        else:
            merged = batch_df
        # staged overwrite: merged READS totals_path
        stage_overwrite(merged, totals_path)
        if track_changes:
            batch_df.select("ent").write.mode("append").parquet(
                _changed_path(totals_path)
            )

    return (
        counts.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def rerank_with_support(
    triples: DataFrame, totals: DataFrame, alpha: float = 0.1
) -> DataFrame:
    """(rel, ents, weight, rank, min_ent_mentions, support_score,
    support_rank): the corpus-support-adjusted ranking —
    ``score = weight * (1 + alpha * log1p(min_ent_mentions))`` — an
    engine extension beyond the reference (which never re-ranks after
    harvest): triples all of whose entities are well-attested in the
    crawl rise; unattested ones keep their LM-only ordering at
    min_ent_mentions = 0. Deterministic tie-break on the entity key."""
    from pyspark.sql import Window as W

    exploded = triples.select(
        "rel", "ents", "weight", "rank", F.explode("ents").alias("ent")
    ).withColumn("ent", F.lower("ent"))
    # no explicit broadcast hint: totals grows with the harvest's
    # cumulative distinct-entity count, so a pinned broadcast could
    # blow the driver/executor broadcast limit at streaming scale —
    # AQE picks broadcast automatically while totals is actually small
    # (ADVICE r3)
    joined = exploded.join(
        totals.select("ent", "n_mentions"), "ent", "left"
    ).withColumn("n_mentions", F.coalesce("n_mentions", F.lit(0)))
    support = joined.groupBy("rel", "ents", "weight", "rank").agg(
        F.min("n_mentions").alias("min_ent_mentions")
    )
    score = F.col("weight") * (
        F.lit(1.0) + F.lit(alpha) * F.log1p(F.col("min_ent_mentions"))
    )
    w = W.partitionBy("rel").orderBy(
        F.desc("support_score"), F.concat_ws("\x1f", "ents")
    )
    return (
        support.withColumn("support_score", F.round(score, 9))
        .withColumn("support_rank", F.row_number().over(w))
    )


def incremental_rerank(
    spark: SparkSession,
    triples: DataFrame,
    totals_path: str,
    reranked_path: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Consume the ``.changed`` delta feed and refresh the persisted
    support-ranked table for ONLY the relations that contain a changed
    entity — the drop-to-rerank increment of a streaming harvest
    (unchanged relations' rows are carried over verbatim, never
    rescored). Clears the delta feed afterwards. Returns the refreshed
    table. First call (no reranked table yet) ranks everything."""
    def _exists(path: str) -> bool:
        return hadoop_exists(spark, path)

    changed_path = _changed_path(totals_path)
    totals = (
        spark.read.parquet(totals_path)
        if _exists(totals_path)
        else spark.createDataFrame([], "ent string, n_mentions long, n_batches long")
    )

    if not _exists(reranked_path):
        out = rerank_with_support(triples, totals, alpha)
    else:
        if _exists(changed_path):
            changed = spark.read.parquet(changed_path).select(
                F.lower("ent").alias("ent")
            ).distinct()
        else:
            changed = spark.createDataFrame([], "ent string")
        existing = spark.read.parquet(reranked_path)
        # rescore relations whose entities changed PLUS relations whose
        # TRIPLE SET changed since the last refresh (a newer harvest
        # can add/remove tuples — or whole relations — between drops;
        # relation-granular new-rel detection alone would still miss a
        # new tuple inside an existing relation). Carried-over rows are
        # restricted to relations still present in `triples`, so
        # deleted relations age out instead of persisting forever.
        cur_rels = triples.select("rel").distinct()
        touched = (
            triples.select("rel", F.explode("ents").alias("ent"))
            .withColumn("ent", F.lower("ent"))
            .join(F.broadcast(changed), "ent", "left_semi")
            .select("rel")
            .distinct()
        )
        # the drift key carries the SCORING INPUTS (weight, rank), not
        # just the entity strings: a re-harvest that changes a tuple's
        # weight in place (prompt-weight / config change) must mark the
        # relation affected, or the persisted table would carry the
        # stale weight/support_score forever. weight is rounded to the
        # same 9 decimals rerank_with_support emits, so float jitter
        # below the output precision doesn't force spurious rescores.
        tkey = [
            "rel",
            F.concat_ws(
                "\x1f",
                F.concat_ws("\x1e", "ents"),
                F.round("weight", 9).cast("string"),
                F.col("rank").cast("string"),
            ).alias("_k"),
        ]
        cur_keys = triples.select(*tkey)
        old_keys = existing.select(*tkey)
        drifted = (
            cur_keys.join(old_keys, ["rel", "_k"], "left_anti")
            .unionByName(old_keys.join(cur_keys, ["rel", "_k"], "left_anti"))
            .select("rel")
            .distinct()
        )
        affected = touched.unionByName(drifted).distinct()
        fresh = rerank_with_support(
            triples.join(F.broadcast(affected), "rel", "left_semi"), totals, alpha
        )
        kept = existing.join(F.broadcast(affected), "rel", "left_anti").join(
            F.broadcast(cur_rels), "rel", "left_semi"
        )
        out = kept.unionByName(fresh)

    stage_overwrite(out, reranked_path)
    hadoop_delete(spark, changed_path)
    return spark.read.parquet(reranked_path)


def incremental_rerank_txn(
    spark: SparkSession,
    out_dir: str,
    totals_path: str,
    alpha: float = 0.1,
) -> DataFrame:
    """CDC-driven refresh of the support-ranked table for a
    :class:`~..txn.TxnLog` harvest root (the ``txn=True`` mode of
    ``harvest_relation_stream``).

    Where :func:`incremental_rerank` must DIFF the full current triple
    table against the full persisted ranking to find drifted relations
    (O(harvest size) per drop), this variant reads the log's
    ``harvested_rels`` ledger CHANGELOG: on the txn path a relation's
    triple set changes only when a batch harvests it and appends its
    ledger row, so ``read_changes("harvested_rels", cursor)`` names
    exactly the relations needing a rescore — a metadata-only dir diff
    plus the handful of new ledger rows, independent of how large the
    harvest has grown. Entity-support deltas still come from the
    ``<totals>.changed`` feed (``track_changes=True``), same as the
    plain variant. (Triples edited out-of-band — not through the
    streaming harvest — are invisible to the ledger; use
    :func:`incremental_rerank` for that layout.)

    The refreshed ranking commits INTO the log as table ``reranked``
    with its source version(s) in the commit meta — the cursor the
    next call resumes from. When ``totals_path`` is itself a TxnLog
    root (the grounding stream's ``txn=True`` mode), the
    changed-entity delta is ALSO consumed by CDC against a
    ``totals_version`` cursor instead of the delete-after-read
    ``.changed`` feed. Falls back to a full rescore whenever the
    incremental contract can't be proven: no previous ranking, a
    vacuumed cursor manifest, or a compaction inside either range
    (``read_changes`` raises past a rewrite by design). If the
    harvest stream commits between this function's snapshot and its
    own commit, those batches simply stay ahead of the recorded
    cursor and are picked up next call — over-inclusion at worst,
    never a missed rescore."""
    from ..txn import TxnLog, is_txn_root
    from .relations import _triples_path

    log = TxnLog(spark, out_dir)
    src_v, _ = log.latest()
    tpath = _triples_path(out_dir)
    if hadoop_exists(spark, tpath):
        # rel is a partition directory: cast pins numeric-looking
        # relation names back to string (the stream's own readers pin
        # an explicit schema for the same reason)
        triples = spark.read.parquet(tpath).withColumn(
            "rel", F.col("rel").cast("string")
        )
    else:
        # cron'd rerank before the first drop ever harvested
        triples = spark.createDataFrame(
            [], "rel string, ents array<string>, weight double, rank int"
        )
    totals_txn = is_txn_root(spark, totals_path)
    totals_log = TxnLog(spark, totals_path) if totals_txn else None
    empty_totals = spark.createDataFrame(
        [], "ent string, n_mentions long, n_batches long"
    )
    if totals_txn:
        totals_v, _ = totals_log.latest()
        totals = (
            totals_log.read("totals")
            if totals_log.has_table("totals")
            else empty_totals
        )
    else:
        totals_v = 0
        totals = (
            spark.read.parquet(totals_path)
            if hadoop_exists(spark, totals_path)
            else empty_totals
        )

    cursor = t_cursor = None
    if log.has_table("reranked"):
        for v in reversed(log.versions()):
            meta = log.commit_meta(v)
            if meta is not None and "rerank" in meta:
                cursor = int(meta["rerank"]["source_version"])
                t_cursor = int(meta["rerank"].get("totals_version", 0))
                break
    delta_rels = changed = None
    if cursor is not None:
        try:
            delta_rels = (
                log.read_changes("harvested_rels", cursor, to_version=src_v)
                .select("rel")
                .distinct()
            )
        except (ValueError, FileNotFoundError):
            # ledger compacted inside the range, or the cursor's
            # manifest aged out of the vacuum window: the append
            # changelog is no longer expressible — rescore everything
            delta_rels = None
    changed_path = _changed_path(totals_path)
    if delta_rels is not None:
        if totals_txn:
            try:
                changed = (
                    totals_log.read_changes(
                        "changed", t_cursor, to_version=totals_v
                    )
                    .select(F.lower("ent").alias("ent"))
                    .distinct()
                    if totals_log.has_table("changed")
                    else spark.createDataFrame([], "ent string")
                )
            except (ValueError, FileNotFoundError):
                delta_rels = None  # totals log rewritten: full rescore
        elif hadoop_exists(spark, changed_path):
            changed = spark.read.parquet(changed_path).select(
                F.lower("ent").alias("ent")
            ).distinct()
        else:
            changed = spark.createDataFrame([], "ent string")

    if delta_rels is None:
        out = rerank_with_support(triples, totals, alpha)
    else:
        touched = (
            triples.select("rel", F.explode("ents").alias("ent"))
            .withColumn("ent", F.lower("ent"))
            .join(F.broadcast(changed), "ent", "left_semi")
            .select("rel")
            .distinct()
        )
        affected = touched.unionByName(delta_rels).distinct()
        existing = log.read("reranked")
        cur_rels = triples.select("rel").distinct()
        fresh = rerank_with_support(
            triples.join(F.broadcast(affected), "rel", "left_semi"), totals, alpha
        )
        kept = existing.join(F.broadcast(affected), "rel", "left_anti").join(
            F.broadcast(cur_rels), "rel", "left_semi"
        )
        out = kept.unionByName(fresh)

    log.commit(
        overwrites={"reranked": out},
        meta={"rerank": {
            "source_version": int(src_v),
            "totals_version": int(totals_v),
            "alpha": alpha,
        }},
    )
    if not totals_txn:
        hadoop_delete(spark, changed_path)
    return log.read("reranked")


def totals_cursor(spark: SparkSession, harvest_root: str) -> int | None:
    """The totals-log version the newest committed rerank consumed —
    its CDC cursor into the TOTALS log. The cursor is recorded in the
    HARVEST log's rerank meta (the totals log belongs to the grounding
    stream's single writer, so the rerank consumer cannot commit its
    cursor there), which means ``txn.maintain`` of the totals log
    cannot see it: pass this value as ``maintain(totals_log,
    protect={totals_cursor(...)})`` so totals-log maintenance never
    vacuums the cursor manifest (r4 ADVICE — the fallback is a safe
    full rescore, but silent demotion to full rescans is exactly what
    cursor protection exists to prevent). ``None`` when no rerank has
    ever committed."""
    from ..txn import TxnLog

    log = TxnLog(spark, harvest_root)
    for v in reversed(log.versions()):
        meta = log.commit_meta(v) or {}
        if "rerank" in meta:
            return int(meta["rerank"].get("totals_version", 0))
    return None


def grounded_view(
    spark: SparkSession, triples: DataFrame, totals_path: str, min_mentions: int = 1
) -> DataFrame:
    """Triples whose EVERY entity has ≥ min_mentions in the totals
    accumulated so far; attaches min/total support (the batch analog
    of operators/corpus_grounding.ground_triples over the stream).
    ``totals_path`` may be a plain parquet dir or a TxnLog root (the
    grounding stream's ``txn=True`` mode)."""
    from ..txn import TxnLog, is_txn_root

    if is_txn_root(spark, totals_path):
        totals = TxnLog(spark, totals_path).read("totals").select(
            "ent", "n_mentions"
        )
    else:
        totals = spark.read.parquet(totals_path).select("ent", "n_mentions")
    exploded = triples.select(
        "rel", "ents", "weight", F.explode("ents").alias("ent")
    ).withColumn("ent", F.lower("ent"))
    # unhinted for the same reason as rerank_with_support: totals is
    # unbounded over the stream's lifetime; let AQE choose
    joined = exploded.join(totals, "ent", "left").withColumn(
        "n_mentions", F.coalesce("n_mentions", F.lit(0))
    )
    return (
        joined.groupBy("rel", "ents", "weight")
        .agg(
            F.min("n_mentions").alias("min_ent_mentions"),
            F.sum("n_mentions").alias("total_mentions"),
        )
        .filter(F.col("min_ent_mentions") >= min_mentions)
    )
