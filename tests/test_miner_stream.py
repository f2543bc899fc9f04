"""Streaming triple mining (streaming/miner.py): streamed partial
counts fold to EXACTLY the batch miners' output (count monoid), the
checkpoint makes restarts no-ops, and new drops contribute
incrementally."""

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.streaming.miner import (
    fold_mined,
    mine_batch,
    mine_triples_stream,
)

VERBS = ["married", "lives"]
PREPS = ["in"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BATCH1 = [
    (1, "fruits such as apples and pears. alice lives in paris."),
    (2, "apples are a fruit. bob married carol."),
]
BATCH2 = [
    (3, "fruits such as apples. alice lives in paris."),
    (4, "no patterns at all here."),
]


def _folded(df):
    return {(r.subj, r.pred, r.obj): r.n for r in df.collect()}


def test_stream_equals_batch_and_restart_is_noop(spark, tmp_path):
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "mined")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, BATCH1).write.mode("append").parquet(drop)
    q = mine_triples_stream(spark, drop, out, ckpt, VERBS, PREPS)
    q.awaitTermination(120)

    batch_now = _folded(mine_batch(_docs(spark, BATCH1), VERBS, PREPS))
    assert _folded(fold_mined(spark, out)) == batch_now
    assert batch_now[("apples", "isa:such_as", "fruits")] == 1
    assert batch_now[("alice", "lives in", "paris")] == 1
    assert batch_now[("apples", "isa:copula_isa", "fruit")] == 1

    # restart on the same checkpoint: nothing new -> no double counts
    q2 = mine_triples_stream(spark, drop, out, ckpt, VERBS, PREPS)
    q2.awaitTermination(120)
    assert _folded(fold_mined(spark, out)) == batch_now

    # a second crawl drop folds incrementally to the full-batch result
    _docs(spark, BATCH2).write.mode("append").parquet(drop)
    q3 = mine_triples_stream(spark, drop, out, ckpt, VERBS, PREPS)
    q3.awaitTermination(120)
    full = _folded(
        mine_batch(_docs(spark, BATCH1 + BATCH2), VERBS, PREPS)
    )
    got = _folded(fold_mined(spark, out))
    assert got == full
    assert got[("apples", "isa:such_as", "fruits")] == 2
    assert got[("alice", "lives in", "paris")] == 2


def test_folded_stream_feeds_graph_merge(spark, tmp_path):
    from knowledge_harvest_from_lms_spark.operators.graph import (
        materialize_graph,
    )

    drop = str(tmp_path / "drop")
    out = str(tmp_path / "mined")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, BATCH1).write.mode("append").parquet(drop)
    mine_triples_stream(spark, drop, out, ckpt, VERBS, PREPS).awaitTermination(120)

    triples = fold_mined(spark, out).select(
        F.col("pred").alias("rel"),
        F.array("subj", "obj").alias("ents"),
        F.col("n").cast("double").alias("weight"),
    )
    g = materialize_graph(triples, sim_threshold=0.9)
    edges = {(r.src, r.rel, r.dst) for r in g["edges"].collect()}
    assert ("alice", "lives in", "paris") in edges
    assert ("apples", "isa:such_as", "fruits") in edges
