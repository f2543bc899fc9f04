"""Streaming ingest: drop dir → availableNow drain → day-partitioned
table, duplicate urls within watermark dropped."""

from knowledge_harvest_from_lms_spark.sources.web_pages import (
    synth_web_pages,
    write_web_pages,
)
from knowledge_harvest_from_lms_spark.streaming.ingest import ingest_pages


def test_ingest_available_now(spark, tmp_path):
    drop = str(tmp_path / "drop")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    pages = synth_web_pages(spark, 120, seed=42, n_partitions=3)
    # write the drop twice: second batch is pure duplicates
    pages.write.mode("overwrite").parquet(drop)

    q = ingest_pages(spark, drop, table, ckpt, available_now=True)
    q.awaitTermination(120)

    out = spark.read.parquet(table)
    assert out.count() == 120
    assert "day" in out.columns
    # restart on the same checkpoint: no files left to process → no dupes
    q2 = ingest_pages(spark, drop, table, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(table).count() == 120

    # new crawl drop with FRESH timestamps (inside the watermark):
    # restart ingests exactly the new rows
    from pyspark.sql import functions as F

    late = (
        synth_web_pages(spark, 300, seed=42, n_partitions=2)
        .filter("url like '%/p/2__'")  # ids 200-299: urls disjoint from first 120
        .withColumn("warc_ts", F.expr("timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0, cast(substring_index(url,'/',-1) as int))"))
    )
    n_late = late.count()
    late.write.mode("append").parquet(drop)
    q3 = ingest_pages(spark, drop, table, ckpt, available_now=True)
    q3.awaitTermination(120)
    total = spark.read.parquet(table).count()
    assert total == 120 + n_late, (total, n_late)

    # a drop with timestamps far behind the watermark is treated as
    # late data and excluded from the stream (backfill path instead)
    stale = late.withColumn(
        "warc_ts", F.expr("timestamp'2020-01-01 00:00:00'")
    ).withColumn("url", F.concat("url", F.lit("-stale")))
    stale.write.mode("append").parquet(drop)
    q4 = ingest_pages(spark, drop, table, ckpt, available_now=True)
    q4.awaitTermination(120)
    assert spark.read.parquet(table).count() == total


def test_stateful_mention_counts(spark, tmp_path):
    """applyInPandasWithState running totals: counts accumulate across
    micro-batches and re-emit updated rows per trigger."""
    from pyspark.sql import functions as F

    from knowledge_harvest_from_lms_spark.sources.web_pages import (
        WEB_PAGES_SCHEMA,
    )
    from knowledge_harvest_from_lms_spark.streaming.stateful import (
        streaming_mention_counts,
    )

    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    # incl. a multi-word entity: the stream must count n-gram phrases
    # exactly like the batch operator, not just unigrams
    ents = spark.createDataFrame(
        [("giraffe",), ("africa",), ("is big",)], "ent string"
    )

    def batch(rows):
        return spark.createDataFrame(
            [
                (url, b"", text, "en", __import__("datetime").datetime(2024, 3, 1))
                for url, text in rows
            ],
            "url string, html binary, text string, lang string, warc_ts timestamp",
        ).select(*[f.name for f in WEB_PAGES_SCHEMA.fields])

    out_dir = str(tmp_path / "out")

    def run_drain():
        # foreachBatch parquet sink: recoverable from the checkpoint
        # (memory sink is not), batch ids keep incrementing across
        # restarts so emissions stay attributable
        def sink(df, bid):
            df.withColumn("batch_id", F.lit(bid)).write.mode("append").parquet(out_dir)

        q = (
            streaming_mention_counts(
                spark.readStream.schema(WEB_PAGES_SCHEMA).parquet(drop), ents
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch(
        [("u1", "the giraffe saw a giraffe in africa"), ("u2", "africa is big")]
    ).write.mode("append").parquet(drop)
    run_drain()
    first = {
        r.ent: (r.n_mentions, r.n_batches)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert first == {"giraffe": (2, 1), "africa": (2, 1), "is big": (1, 1)}

    # second drop: totals must ACCUMULATE through the checkpointed state
    batch([("u3", "another giraffe appears")]).write.mode("append").parquet(drop)
    run_drain()
    out = spark.read.parquet(out_dir)
    last_bid = out.agg(F.max("batch_id")).collect()[0][0]
    upd = {
        r.ent: (r.n_mentions, r.n_batches)
        for r in out.filter(F.col("batch_id") == last_bid).collect()
    }
    # only the entity seen in the new batch re-emits, with running totals
    assert upd == {"giraffe": (3, 2)}


def test_incremental_grounding(spark, tmp_path):
    """New crawl drops incrementally raise entity support: a triple
    crosses min_mentions only once enough pages have streamed in —
    without rescanning earlier drops."""
    from pyspark.sql import functions as F  # noqa: F401

    from knowledge_harvest_from_lms_spark.sources.web_pages import WEB_PAGES_SCHEMA
    from knowledge_harvest_from_lms_spark.streaming.incremental import (
        grounded_view,
        start_incremental_grounding,
    )

    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    totals = str(tmp_path / "totals")
    triples = spark.createDataFrame(
        [("AtLocation", ["giraffe", "africa"], 0.9),
         ("AtLocation", ["unicorn", "atlantis"], 0.1)],
        "rel string, ents array<string>, weight double",
    )

    def write_drop(rows):
        spark.createDataFrame(
            [(u, b"", t, "en", __import__("datetime").datetime(2024, 3, 1))
             for u, t in rows],
            "url string, html binary, text string, lang string, warc_ts timestamp",
        ).select(*[f.name for f in WEB_PAGES_SCHEMA.fields]).write.mode(
            "append"
        ).parquet(drop)

    def drain():
        q = start_incremental_grounding(
            spark, spark.readStream.schema(WEB_PAGES_SCHEMA).parquet(drop),
            triples, totals, ckpt,
        )
        q.awaitTermination(120)

    # drop 1: giraffe appears, africa does not -> triple ungrounded
    write_drop([("u1", "a giraffe was seen"), ("u2", "nothing else here")])
    drain()
    g1 = grounded_view(spark, triples, totals, min_mentions=1).collect()
    assert g1 == []

    # drop 2: africa appears -> (giraffe, africa) grounded; unicorn never
    write_drop([("u3", "africa has a giraffe too")])
    drain()
    g2 = {tuple(r.ents): (r.min_ent_mentions, r.total_mentions)
          for r in grounded_view(spark, triples, totals, min_mentions=1).collect()}
    assert g2 == {("giraffe", "africa"): (1, 3)}


def test_incremental_rerank_only_affected_relations(spark, tmp_path):
    """Drop → delta entities → support re-rank of ONLY the relations
    whose entities changed: the untouched relation's rows carry over
    verbatim; the affected relation's ordering flips once corpus
    support outweighs the LM weight margin; the delta feed is cleared
    after consumption."""
    import os

    from knowledge_harvest_from_lms_spark.sources.web_pages import WEB_PAGES_SCHEMA
    from knowledge_harvest_from_lms_spark.streaming.incremental import (
        incremental_rerank,
        start_incremental_grounding,
    )

    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    totals = str(tmp_path / "totals")
    reranked = str(tmp_path / "reranked")
    triples = spark.createDataFrame(
        [
            ("AtLocation", ["giraffe", "africa"], 0.4, 2),
            ("AtLocation", ["unicorn", "atlantis"], 0.6, 1),
            ("CapableOf", ["bird", "fly"], 0.7, 1),
            ("CapableOf", ["fish", "sing"], 0.3, 2),
        ],
        "rel string, ents array<string>, weight double, rank int",
    )

    def write_drop(rows):
        spark.createDataFrame(
            [(u, b"", t, "en", __import__("datetime").datetime(2024, 3, 1))
             for u, t in rows],
            "url string, html binary, text string, lang string, warc_ts timestamp",
        ).select(*[f.name for f in WEB_PAGES_SCHEMA.fields]).write.mode(
            "append"
        ).parquet(drop)

    def drain():
        q = start_incremental_grounding(
            spark, spark.readStream.schema(WEB_PAGES_SCHEMA).parquet(drop),
            triples, totals, ckpt, track_changes=True,
        )
        q.awaitTermination(120)

    # drop 1: only AtLocation entities appear; strong giraffe/africa support
    write_drop([
        ("u1", "giraffe africa giraffe africa giraffe africa"),
        ("u2", "giraffe africa giraffe africa"),
    ])
    drain()
    r1 = incremental_rerank(spark, triples, totals, reranked, alpha=1.0)
    rows1 = {(r.rel, tuple(r.ents)): (r.support_rank, r.min_ent_mentions)
             for r in r1.collect()}
    # support flips AtLocation: 0.4*(1+ln(1+5)) > 0.6*(1+0)
    assert rows1[("AtLocation", ("giraffe", "africa"))][0] == 1
    assert rows1[("AtLocation", ("unicorn", "atlantis"))][0] == 2
    # CapableOf keeps LM-only ordering (no support either way)
    assert rows1[("CapableOf", ("bird", "fly"))][0] == 1
    # delta feed consumed
    assert not os.path.exists(totals + ".changed")

    # drop 2: only CapableOf entities appear -> AtLocation rows carry
    # over BYTE-identical (they are not rescored)
    before_at = sorted(
        map(str, r1.filter("rel = 'AtLocation'").collect())
    )
    write_drop([("u3", "fish sing fish sing fish sing fish sing")])
    drain()
    r2 = incremental_rerank(spark, triples, totals, reranked, alpha=1.0)
    after_at = sorted(map(str, r2.filter("rel = 'AtLocation'").collect()))
    assert after_at == before_at
    rows2 = {(r.rel, tuple(r.ents)): (r.support_rank, r.min_ent_mentions)
             for r in r2.collect()}
    # 0.3*(1+ln(5)) ~ 0.78 > 0.7 -> fish/sing overtakes bird/fly
    assert rows2[("CapableOf", ("fish", "sing"))][0] == 1
    assert rows2[("CapableOf", ("bird", "fly"))][0] == 2


def test_incremental_rerank_handles_new_and_removed_relations(spark, tmp_path):
    """Between drops a newer harvest can ADD relations (must be ranked
    even if no drop touched their entities) and REMOVE relations (their
    stale rows must age out of the persisted table)."""
    from knowledge_harvest_from_lms_spark.streaming.incremental import (
        incremental_rerank,
    )

    totals = str(tmp_path / "totals")
    reranked = str(tmp_path / "reranked")
    spark.createDataFrame(
        [("giraffe", 5, 1)], "ent string, n_mentions long, n_batches long"
    ).write.parquet(totals)

    t1 = spark.createDataFrame(
        [("AtLocation", ["giraffe", "africa"], 0.9, 1),
         ("Obsolete", ["unicorn", "atlantis"], 0.5, 1)],
        "rel string, ents array<string>, weight double, rank int",
    )
    r1 = incremental_rerank(spark, t1, totals, reranked)
    assert {r.rel for r in r1.collect()} == {"AtLocation", "Obsolete"}

    # harvest evolves: Obsolete dropped, NewRel added; NO drop ran in
    # between (no .changed feed)
    t2 = spark.createDataFrame(
        [("AtLocation", ["giraffe", "africa"], 0.9, 1),
         ("NewRel", ["bird", "fly"], 0.7, 1)],
        "rel string, ents array<string>, weight double, rank int",
    )
    r2 = incremental_rerank(spark, t2, totals, reranked)
    rows = {r.rel: r for r in r2.collect()}
    assert set(rows) == {"AtLocation", "NewRel"}  # Obsolete aged out
    assert rows["NewRel"].support_rank == 1       # ranked despite no delta


def test_incremental_rerank_detects_inplace_weight_change(spark, tmp_path):
    """A re-harvest that changes an existing tuple's WEIGHT without
    changing its entity strings (prompt-weight / config change) must
    mark the relation affected — the drift key carries the scoring
    inputs, not just (rel, ents) (ADVICE r3 medium)."""
    from knowledge_harvest_from_lms_spark.streaming.incremental import (
        incremental_rerank,
    )

    totals = str(tmp_path / "totals")
    reranked = str(tmp_path / "reranked")
    spark.createDataFrame(
        [("giraffe", 5, 1)], "ent string, n_mentions long, n_batches long"
    ).write.parquet(totals)

    t1 = spark.createDataFrame(
        [("AtLocation", ["giraffe", "africa"], 0.9, 1),
         ("AtLocation", ["lion", "savanna"], 0.8, 2)],
        "rel string, ents array<string>, weight double, rank int",
    )
    r1 = incremental_rerank(spark, t1, totals, reranked, alpha=0.0)
    w1 = {tuple(r.ents): r.support_score for r in r1.collect()}
    assert w1[("giraffe", "africa")] == 0.9

    # same entity strings, new weights (order flips); NO .changed feed
    t2 = spark.createDataFrame(
        [("AtLocation", ["giraffe", "africa"], 0.2, 2),
         ("AtLocation", ["lion", "savanna"], 0.8, 1)],
        "rel string, ents array<string>, weight double, rank int",
    )
    r2 = incremental_rerank(spark, t2, totals, reranked, alpha=0.0)
    rows = {tuple(r.ents): r for r in r2.collect()}
    assert rows[("giraffe", "africa")].support_score == 0.2  # not stale 0.9
    assert rows[("giraffe", "africa")].support_rank == 2
    assert rows[("lion", "savanna")].support_rank == 1


def test_stage_overwrite_all_cleans_stale_tmp(spark, tmp_path):
    """A crashed previous run leaves <path>.tmp behind; the next
    overwrite must clear it on entry so a half-written stale stage can
    never be promoted (ADVICE r3)."""
    import os

    from knowledge_harvest_from_lms_spark.fsutil import stage_overwrite

    path = str(tmp_path / "tbl")
    stale = path + ".tmp"
    # fake a crashed run: stale tmp with DIFFERENT data
    spark.createDataFrame([(99,)], "x int").write.parquet(stale)
    stage_overwrite(spark.createDataFrame([(1,), (2,)], "x int"), path)
    assert sorted(r.x for r in spark.read.parquet(path).collect()) == [1, 2]
    assert not os.path.exists(stale)


def test_incremental_rerank_txn_cdc(spark, tmp_path):
    """TxnLog-rooted rerank: affected relations come from the ledger
    CHANGELOG (read_changes) + the entity delta feed — never from a
    full-table drift diff. Observable discriminator: totals that move
    under a relation NOT named by either feed leave its persisted rows
    stale-carried; a ledger compaction inside the range forces the
    full-rescore fallback, which then picks the new totals up."""
    import os

    from knowledge_harvest_from_lms_spark.streaming.incremental import (
        incremental_rerank_txn,
    )
    from knowledge_harvest_from_lms_spark.txn import TxnLog

    out = str(tmp_path / "wh")
    totals = str(tmp_path / "totals")
    log = TxnLog(spark, out)

    def write_rel(rel, rows):
        spark.createDataFrame(
            [(rel, *r) for r in rows],
            "rel string, ents array<string>, weight double, rank int",
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("rel").parquet(out + "/triples")
        log.commit(appends={"harvested_rels": spark.createDataFrame(
            [(rel, 0, len(rows))], "rel string, batch_id long, n_triples long"
        ).coalesce(1)})

    def write_totals(rows):
        spark.createDataFrame(
            rows, "ent string, n_mentions long, n_batches long"
        ).write.mode("overwrite").parquet(totals)

    write_rel("AtLocation", [(["giraffe", "africa"], 0.4, 2),
                             (["unicorn", "atlantis"], 0.6, 1)])
    write_rel("CapableOf", [(["bird", "fly"], 0.7, 1),
                            (["fish", "sing"], 0.3, 2)])
    write_totals([("giraffe", 5, 1), ("africa", 5, 1)])

    # first call: no previous ranking -> full rescore, cursor recorded
    r1 = incremental_rerank_txn(spark, out, totals, alpha=1.0)
    rows1 = {(r.rel, tuple(r.ents)): r.support_rank for r in r1.collect()}
    assert rows1[("AtLocation", ("giraffe", "africa"))] == 1  # support flip
    assert rows1[("CapableOf", ("bird", "fly"))] == 1
    v1, m1 = log.latest()
    assert m1["meta"]["rerank"]["source_version"] == v1 - 1

    # new relation lands via the ledger; totals ALSO move under
    # CapableOf — but no .changed feed names its entities and its
    # ledger rows are pre-cursor, so its stale rows must carry over
    # while the new relation scores against the NEW totals
    write_rel("HasA", [(["tree", "leaf"], 0.5, 1)])
    write_totals([("giraffe", 5, 1), ("africa", 5, 1),
                  ("fish", 9, 1), ("sing", 9, 1), ("tree", 9, 1),
                  ("leaf", 9, 1)])
    r2 = incremental_rerank_txn(spark, out, totals, alpha=1.0)
    got2 = {(r.rel, tuple(r.ents)): (r.support_rank, r.min_ent_mentions)
            for r in r2.collect()}
    assert got2[("HasA", ("tree", "leaf"))] == (1, 9)       # fresh, new totals
    assert got2[("CapableOf", ("fish", "sing"))] == (2, 0)  # stale carry-over
    assert got2[("AtLocation", ("giraffe", "africa"))] == (1, 5)

    # the entity delta feed routes a rescore to CapableOf only
    spark.createDataFrame([("fish",)], "ent string").write.mode(
        "append"
    ).parquet(totals + ".changed")
    r3 = incremental_rerank_txn(spark, out, totals, alpha=1.0)
    got3 = {(r.rel, tuple(r.ents)): (r.support_rank, r.min_ent_mentions)
            for r in r3.collect()}
    # 0.3*(1+ln(10)) ~ 1.0 > 0.7 -> fish/sing overtakes with min=9
    assert got3[("CapableOf", ("fish", "sing"))] == (1, 9)
    assert not os.path.exists(totals + ".changed")  # feed consumed

    # compaction inside the range breaks the append changelog -> the
    # next call must FULL-rescore (everything sees current totals)
    write_totals([("unicorn", 50, 1), ("atlantis", 50, 1)])
    log.compact("harvested_rels")
    r4 = incremental_rerank_txn(spark, out, totals, alpha=1.0)
    got4 = {(r.rel, tuple(r.ents)): (r.support_rank, r.min_ent_mentions)
            for r in r4.collect()}
    assert got4[("AtLocation", ("unicorn", "atlantis"))] == (1, 50)
    assert got4[("AtLocation", ("giraffe", "africa"))] == (2, 0)
    # steady state resumes incrementally after the fallback commit
    vN, mN = log.latest()
    assert mN["meta"]["rerank"]["source_version"] == vN - 1


def test_incremental_grounding_txn_atomic_delta(spark, tmp_path):
    """txn grounding: the totals upsert and the changed-entity delta
    land as ONE TxnLog commit per micro-batch (the plain layout can
    crash between the two writes and lose the delta), and the rerank
    consumes the delta by CDC against its totals_version cursor —
    entities changed in drop 1 don't re-trigger rescores after drop 2."""
    from knowledge_harvest_from_lms_spark.sources.web_pages import WEB_PAGES_SCHEMA
    from knowledge_harvest_from_lms_spark.streaming.incremental import (
        grounded_view,
        incremental_rerank_txn,
        start_incremental_grounding,
    )
    from knowledge_harvest_from_lms_spark.txn import TxnLog

    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    totals = str(tmp_path / "totals")   # becomes a TxnLog root
    out = str(tmp_path / "wh")          # harvest root (TxnLog)
    hlog = TxnLog(spark, out)
    tlog = TxnLog(spark, totals)

    triples = spark.createDataFrame(
        [
            ("AtLocation", ["giraffe", "africa"], 0.4, 2),
            ("AtLocation", ["unicorn", "atlantis"], 0.6, 1),
            ("CapableOf", ["bird", "fly"], 0.7, 1),
            ("CapableOf", ["fish", "sing"], 0.3, 2),
        ],
        "rel string, ents array<string>, weight double, rank int",
    )
    triples.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("rel").parquet(out + "/triples")
    hlog.commit(appends={"harvested_rels": spark.createDataFrame(
        [("AtLocation", 0, 2), ("CapableOf", 0, 2)],
        "rel string, batch_id long, n_triples long",
    ).coalesce(1)})

    def write_drop(rows):
        spark.createDataFrame(
            [(u, b"", t, "en", __import__("datetime").datetime(2024, 3, 1))
             for u, t in rows],
            "url string, html binary, text string, lang string, warc_ts timestamp",
        ).select(*[f.name for f in WEB_PAGES_SCHEMA.fields]).write.mode(
            "append"
        ).parquet(drop)

    def drain():
        q = start_incremental_grounding(
            spark, spark.readStream.schema(WEB_PAGES_SCHEMA).parquet(drop),
            triples, totals, ckpt, txn=True,
        )
        q.awaitTermination(120)

    write_drop([("u1", "giraffe africa giraffe africa giraffe africa"),
                ("u2", "giraffe africa giraffe africa")])
    drain()
    # one atomic commit: totals AND changed appeared together
    v1, m1 = tlog.latest()
    assert set(m1["tables"]) == {"totals", "changed"}
    assert sorted(r.ent for r in tlog.read("changed").collect()) == [
        "africa", "giraffe",
    ]
    import os
    assert not os.path.exists(totals + ".changed")  # no plain feed

    r1 = incremental_rerank_txn(spark, out, totals, alpha=1.0)
    rows1 = {(r.rel, tuple(r.ents)): r.support_rank for r in r1.collect()}
    assert rows1[("AtLocation", ("giraffe", "africa"))] == 1  # support flip
    # cursor recorded both versions
    meta = hlog.latest()[1]["meta"]["rerank"]
    assert meta["totals_version"] == v1

    # drop 2 touches only CapableOf entities; AtLocation rows must
    # carry over byte-identical (drop-1 deltas are behind the cursor)
    before_at = sorted(map(str, r1.filter("rel = 'AtLocation'").collect()))
    write_drop([("u3", "fish sing fish sing fish sing fish sing")])
    drain()
    r2 = incremental_rerank_txn(spark, out, totals, alpha=1.0)
    after_at = sorted(map(str, r2.filter("rel = 'AtLocation'").collect()))
    assert after_at == before_at
    rows2 = {(r.rel, tuple(r.ents)): r.support_rank for r in r2.collect()}
    assert rows2[("CapableOf", ("fish", "sing"))] == 1

    # grounded_view reads the txn totals layout
    g = grounded_view(spark, triples, totals, min_mentions=1)
    assert {tuple(r.ents) for r in g.collect()} == {
        ("giraffe", "africa"), ("fish", "sing"),
    }


def test_txn_lifecycle_soak_incremental_equals_full(spark, tmp_path):
    """Soak of the whole txn lifecycle: six drops drain through the
    atomic grounding stream, the CDC rerank consumes after every
    drop, and maintain() compacts/vacuums mid-stream with a tiny
    dir threshold. Golden invariant: after EVERY rerank — incremental
    or fallback-after-compaction — the persisted table equals a
    from-scratch rerank_with_support over the current totals, and
    maintenance keeps per-table generation-dir counts bounded."""
    from knowledge_harvest_from_lms_spark.sources.web_pages import WEB_PAGES_SCHEMA
    from knowledge_harvest_from_lms_spark.streaming.incremental import (
        incremental_rerank_txn,
        rerank_with_support,
        start_incremental_grounding,
    )
    from knowledge_harvest_from_lms_spark.txn import TxnLog, maintain

    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    totals = str(tmp_path / "totals")
    out = str(tmp_path / "wh")
    hlog, tlog = TxnLog(spark, out), TxnLog(spark, totals)

    triples = spark.createDataFrame(
        [
            ("AtLocation", ["giraffe", "africa"], 0.4, 2),
            ("AtLocation", ["unicorn", "atlantis"], 0.6, 1),
            ("CapableOf", ["bird", "fly"], 0.7, 1),
            ("CapableOf", ["fish", "sing"], 0.3, 2),
            ("HasA", ["tree", "leaf"], 0.5, 1),
        ],
        "rel string, ents array<string>, weight double, rank int",
    )
    triples.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("rel").parquet(out + "/triples")
    hlog.commit(appends={"harvested_rels": spark.createDataFrame(
        [("AtLocation", 0, 2), ("CapableOf", 0, 2), ("HasA", 0, 1)],
        "rel string, batch_id long, n_triples long",
    ).coalesce(1)})

    texts = [
        "giraffe africa giraffe",
        "fish sing",
        "tree leaf tree leaf tree leaf",
        "unicorn atlantis bird fly",
        "giraffe sing leaf",
        "africa africa africa fish",
    ]

    def drain():
        q = start_incremental_grounding(
            spark, spark.readStream.schema(WEB_PAGES_SCHEMA).parquet(drop),
            triples, totals, ckpt, txn=True,
        )
        q.awaitTermination(120)

    def norm(df):
        return sorted(
            (r.rel, tuple(r.ents), r.support_rank,
             r.min_ent_mentions, r.support_score)
            for r in df.collect()
        )

    for i, text in enumerate(texts):
        spark.createDataFrame(
            [(f"u{i}", b"", text, "en",
              __import__("datetime").datetime(2024, 3, 1))],
            "url string, html binary, text string, lang string, warc_ts timestamp",
        ).select(*[f.name for f in WEB_PAGES_SCHEMA.fields]).write.mode(
            "append"
        ).parquet(drop)
        drain()
        got = incremental_rerank_txn(spark, out, totals, alpha=1.0)
        want = rerank_with_support(triples, tlog.read("totals"), alpha=1.0)
        assert norm(got) == norm(want), f"divergence after drop {i}"
        if i % 2 == 1:  # mid-stream maintenance with a tiny threshold
            for log in (tlog, hlog):
                maintain(log, max_dirs=2, retain=2)
            assert all(len(d) <= 2 for d in tlog.tables().values())
        # dir growth stays bounded across the whole run
        assert all(len(d) <= 4 for d in tlog.tables().values())


def test_ingest_canonical_dedup(spark, tmp_path):
    """canonical=True: messy respins of one page (tracking params,
    case, default port) collapse to ONE ingested row per canonical
    url within the watermark."""
    import datetime

    from pyspark.sql import Row

    from knowledge_harvest_from_lms_spark.sources.web_pages import (
        WEB_PAGES_SCHEMA,
    )

    drop = str(tmp_path / "drop")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        Row(url="https://site.example/p?a=1", warc_ts=ts,
            html=b"<html><body>x</body></html>", text="", lang="en"),
        Row(url="HTTPS://Site.Example:443/p?utm_source=m&a=1", warc_ts=ts,
            html=b"<html><body>x</body></html>", text="", lang="en"),
        Row(url="https://site.example/p?a=1&fbclid=F", warc_ts=ts,
            html=b"<html><body>x</body></html>", text="", lang="en"),
        Row(url="https://other.example/q", warc_ts=ts,
            html=b"<html><body>y</body></html>", text="", lang="en"),
    ]
    spark.createDataFrame(rows, WEB_PAGES_SCHEMA).write.mode(
        "overwrite"
    ).parquet(drop)
    q = ingest_pages(spark, drop, table, ckpt, available_now=True,
                     canonical=True)
    q.awaitTermination(120)
    out = spark.read.parquet(table).collect()
    assert len(out) == 2
    canon = sorted(r.canonical_url for r in out)
    assert canon == [
        "https://other.example/q",
        "https://site.example/p?a=1",
    ]


def test_ingest_quality_gate(spark, tmp_path):
    """--quality: the fused extract+Gopher Arrow pass admits only
    pages whose extracted text passes the rule set; schema unchanged;
    junk never lands in the table."""
    import datetime

    import pytest
    from pyspark.sql import Row

    from knowledge_harvest_from_lms_spark.sources.web_pages import (
        WEB_PAGES_SCHEMA,
    )

    drop = str(tmp_path / "drop")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    ts = datetime.datetime(2024, 5, 1)
    good_body = " ".join(f"steady word{i} flow" for i in range(20))
    rows = [
        Row(url="https://ok.example.com/a", warc_ts=ts,
            html=f"<html><body>{good_body}</body></html>".encode(),
            text="", lang="en"),
        # 10/10 words are '#': max_symbol_ratio fires
        Row(url="https://junk.example.com/sym", warc_ts=ts,
            html=b"<html><body># # # # # # # # # #</body></html>",
            text="", lang="en"),
        # empty body: min_words fires
        Row(url="https://junk.example.com/empty", warc_ts=ts,
            html=b"<html><body></body></html>",
            text="", lang="en"),
    ]
    spark.createDataFrame(rows, WEB_PAGES_SCHEMA).write.mode(
        "overwrite"
    ).parquet(drop)

    th = {
        "min_words": 3,
        "min_alpha_word_frac": None,
        "max_top_2gram_char_frac": None,
        "max_top_3gram_char_frac": None,
        "max_top_4gram_char_frac": None,
        "max_dup_5gram_frac": None,
        "max_dup_10gram_frac": None,
    }
    q = ingest_pages(
        spark, drop, table, ckpt, available_now=True, quality=th
    )
    q.awaitTermination(120)
    out = spark.read.parquet(table)
    urls = [r["url"] for r in out.select("url").collect()]
    assert urls == ["https://ok.example.com/a"]
    # stored schema unchanged (original cols + day partition)
    assert set(out.columns) == {"url", "warc_ts", "html", "text", "lang", "day"}

    with pytest.raises(ValueError, match="unknown quality rules"):
        ingest_pages(
            spark, drop, table, str(tmp_path / "ckpt2"),
            available_now=True, quality={"nope": 1},
        )
