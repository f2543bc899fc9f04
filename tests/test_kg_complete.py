"""KG completion operators (operators/kg_complete.py): 2-hop path
enumeration + hub guard, PRA precision weighting / leakage guard /
known-edge anti-join, and deterministic filtered negative sampling."""

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.kg_complete import (
    negative_samples,
    pra_score,
    two_hop_paths,
)

EDGE = "src string, rel string, dst string"


def test_two_hop_paths_counts_instances(spark):
    edges = spark.createDataFrame(
        [
            ("a", "r1", "m"), ("m", "r2", "b"),
            ("a", "r1", "m2"), ("m2", "r2", "b"),   # second instance
            ("a", "r1", "m"), ("x", "r9", "y"),     # dup edge, stray
        ],
        EDGE,
    )
    got = {
        (r.src, r.rel1, r.rel2, r.dst): r.n_paths
        for r in two_hop_paths(edges).collect()
    }
    assert got == {("a", "r1", "r2", "b"): 2}


def test_two_hop_max_fanout_drops_hub_mids(spark):
    rows = [("a", "r1", "hub"), ("hub", "r2", "b"),
            ("a", "r1", "m"), ("m", "r2", "b")]
    # give hub extra degree
    rows += [(f"x{i}", "r3", "hub") for i in range(5)]
    edges = spark.createDataFrame(rows, EDGE)
    unguarded = {
        (r.src, r.rel1, r.rel2, r.dst)
        for r in two_hop_paths(edges).collect()
    }
    assert ("a", "r1", "r2", "b") in unguarded
    guarded = two_hop_paths(edges, max_fanout=3)
    mids_used = {
        (r.src, r.rel1, r.rel2, r.dst, r.n_paths)
        for r in guarded.collect()
    }
    # hub (degree 7) pruned as a MID: only the m-path instance remains
    assert mids_used == {("a", "r1", "r2", "b", 1)}


def _kg(spark):
    """3 customers in 2 nations, nations in regions; in_region known
    only for c1 (the training positive)."""
    return spark.createDataFrame(
        [
            ("c1", "in_nation", "n1"), ("c2", "in_nation", "n1"),
            ("c3", "in_nation", "n2"),
            ("n1", "in_region", "r1"), ("n2", "in_region", "r2"),
            ("c1", "in_region", "r1"),      # known target edge
            ("c1", "likes", "c2"),          # noise
        ],
        EDGE,
    )


def test_pra_scores_new_edges_only(spark):
    got = {
        (r.src, r.dst): (r.score, r.n_path_types)
        for r in pra_score(_kg(spark), "in_region").collect()
    }
    # path type (in_nation, in_region) covers pairs:
    #   (c1,r1)+ (c2,r1) (c3,r2)  -> precision 1/3
    # known (c1,r1) anti-joined away; c2/c3 predicted at 1*round(1/3,9)
    third = round(1 / 3, 9)
    assert got == {("c2", "r1"): (third, 1), ("c3", "r2"): (third, 1)}


def test_pra_composition_through_target_edges(spark):
    # paths THROUGH target-rel edges elsewhere in the graph are
    # legitimate features — but their precision is MEASURED, so a
    # zero-precision path type ((in_region, touches) here) never
    # scores, and known edges always leave via the anti-join.
    edges = _kg(spark).unionAll(
        spark.createDataFrame(
            [("r1", "touches", "z1"), ("c2", "in_region", "r1")], EDGE
        )
    )
    got = {
        (r.src, r.dst): (r.score, r.n_path_types)
        for r in pra_score(edges, "in_region").collect()
    }
    # (in_nation, in_region) now has 2 positives of 3 pairs -> 2/3;
    # c1/c2 -> r1 are known (anti-joined); (in_region, touches) and
    # (likes, in_nation) have precision 0 -> never emitted
    assert got == {("c3", "r2"): (round(2 / 3, 9), 1)}
    assert ("c1", "z1") not in got and ("c2", "z1") not in got


def test_pra_min_precision_gates_path_types(spark):
    got = pra_score(_kg(spark), "in_region", min_precision=0.5).collect()
    assert got == []  # the only path type has precision 1/3 < 0.5


def test_negative_samples_deterministic_and_filtered(spark):
    triples = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y")],
        "subj string, pred string, obj string",
    )
    entities = spark.createDataFrame(
        [(e,) for e in ("x", "y", "z", "w", "v")], "entity string"
    )
    out1 = sorted(
        (r.subj, r.pred, r.obj, r.neg_obj, r.probe)
        for r in negative_samples(
            triples, entities, k=3, seed=7, n_buckets=4
        ).collect()
    )
    out2 = sorted(
        (r.subj, r.pred, r.obj, r.neg_obj, r.probe)
        for r in negative_samples(
            triples, entities, k=3, seed=7, n_buckets=4
        ).collect()
    )
    assert out1 == out2 and len(out1) > 0
    for subj, pred, obj, neg, probe in out1:
        assert neg != obj
        assert 0 <= probe < 3
        # filtered setting: (subj, pred, neg) is never a true triple
        assert (subj, pred, neg) not in {("a", "p", "x"), ("b", "p", "y")}


def test_negative_samples_seed_changes_choices(spark):
    triples = spark.createDataFrame(
        [(f"s{i}", "p", f"o{i}") for i in range(20)],
        "subj string, pred string, obj string",
    )
    entities = spark.createDataFrame(
        [(f"o{i}",) for i in range(20)] + [(f"e{i}",) for i in range(20)],
        "entity string",
    )
    a = {
        (r.subj, r.probe): r.neg_obj
        for r in negative_samples(triples, entities, k=2, seed=1).collect()
    }
    b = {
        (r.subj, r.probe): r.neg_obj
        for r in negative_samples(triples, entities, k=2, seed=2).collect()
    }
    shared = set(a) & set(b)
    assert shared and any(a[key] != b[key] for key in shared)


def test_negative_samples_at_most_k_per_triple(spark):
    triples = spark.createDataFrame(
        [(f"s{i}", "p", f"o{i}") for i in range(10)],
        "subj string, pred string, obj string",
    )
    entities = spark.createDataFrame(
        [(f"e{i}",) for i in range(50)], "entity string"
    )
    out = negative_samples(triples, entities, k=2, seed=0)
    per = out.groupBy("subj", "pred", "obj").count().collect()
    assert per and all(r["count"] <= 2 for r in per)
