"""Corpus-mined triples (hearst + openie) feeding the SAME graph as
the MLM harvest — the deployment story both miners exist for: mine,
materialize, then merge an incremental corpus batch with stable
vertex ids and fuzzy surface-form linking."""

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators import hearst, openie
from knowledge_harvest_from_lms_spark.operators.graph import (
    materialize_graph,
    merge_into_graph,
)


def _docs(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _mined(spark, *texts):
    docs = _docs(spark, *texts)
    isa = hearst.as_graph_triples(hearst.hearst_isa(docs))
    rel = openie.as_graph_triples(
        openie.open_ie(docs, verbs=["married", "lives"], preps=["in"])
    )
    return isa.unionByName(rel)


def test_mined_triples_materialize_one_graph(spark):
    t = _mined(
        spark,
        "fruits such as apples and pears. alice lives in paris.",
        "apples are a fruit. alice married bob.",
    )
    g = materialize_graph(t, sim_threshold=0.9)
    edges = {(r.src, r.rel, r.dst) for r in g["edges"].collect()}
    assert ("apples", "isa", "fruits") in edges
    assert ("pears", "isa", "fruits") in edges
    assert ("apples", "isa", "fruit") in edges   # copula pattern
    assert ("alice", "lives in", "paris") in edges
    assert ("alice", "married", "bob") in edges
    verts = {r.ent for r in g["vertices"].collect()}
    # one vertex space across both miners
    assert {"apples", "fruits", "alice", "paris", "bob"} <= verts


def test_incremental_corpus_batch_merges_with_stable_ids(spark):
    g = materialize_graph(
        _mined(spark, "fruits such as apples. alice lives in paris."),
        sim_threshold=0.9,
    )
    ev = g["vertices"].localCheckpoint()
    ee = g["edges"].localCheckpoint()
    id_of = {r.ent: r.ent_id for r in ev.collect()}

    # second crawl batch: a repeat mention (weights accumulate), an
    # edit-1 surface form ("alyce" -> alice), and a new entity
    m = merge_into_graph(
        ev,
        ee,
        _mined(
            spark,
            "fruits such as apples. alyce lives in paris. "
            "carol married dave.",
        ),
        sim_threshold=0.9,
    )
    verts = {r.ent: r.ent_id for r in m["vertices"].collect()}
    edges = {(r.src, r.rel, r.dst): r for r in m["edges"].collect()}

    assert verts["alice"] == id_of["alice"]      # stable id
    assert "alyce" not in verts                  # linked, not minted
    e = edges[("apples", "isa", "fruits")]
    assert e.weight == 2.0 and e.n_mentions == 2
    assert edges[("alice", "lives in", "paris")].n_mentions == 2
    assert ("carol", "married", "dave") in edges
