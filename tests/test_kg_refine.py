"""KG refinement operators (operators/kg_refine.py): type-signature
argmax + tiebreaks, temporal scoping aggregates, paraphrase-cluster
predicate canonicalization, and Sums truth finding (vote-count
equivalence at round 1, reinforcement past it, partitioning
invariance from the integer-quantized sums)."""

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.kg_refine import (
    canonicalize_predicates,
    relation_type_signatures,
    temporal_scope,
    truth_finding,
)

TRIPLE = "subj string, pred string, obj string"


def test_type_signatures_dominant_share_and_untyped_drop(spark):
    triples = spark.createDataFrame(
        [
            ("paris", "capital_of", "france"),
            ("rome", "capital_of", "italy"),
            ("paris", "capital_of", "idea"),   # obj typed 'concept'
            ("ghost", "capital_of", "france"),  # untyped subj -> drops
        ],
        TRIPLE,
    )
    types = spark.createDataFrame(
        [
            ("paris", "city"), ("rome", "city"),
            ("france", "country"), ("italy", "country"),
            ("idea", "concept"),
        ],
        "entity string, type string",
    )
    rows = relation_type_signatures(triples, types).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.pred, r.subj_type, r.obj_type) == ("capital_of", "city", "country")
    assert r.support == 2 and abs(r.share - round(2 / 3, 6)) < 1e-12


def test_type_signatures_tie_breaks_to_smallest_pair(spark):
    triples = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y")], TRIPLE
    )
    types = spark.createDataFrame(
        [("a", "t2"), ("b", "t1"), ("x", "u2"), ("y", "u1")],
        "entity string, type string",
    )
    r = relation_type_signatures(triples, types).collect()[0]
    # (t1,u1) vs (t2,u2) both support 1 -> lexicographically smallest
    assert (r.subj_type, r.obj_type, r.support) == ("t1", "u1", 1)


def test_type_signatures_multitype_entity_counts_combinations(spark):
    triples = spark.createDataFrame([("a", "p", "x")], TRIPLE)
    types = spark.createDataFrame(
        [("a", "t1"), ("a", "t2"), ("x", "u")],
        "entity string, type string",
    )
    rows = relation_type_signatures(triples, types).collect()
    assert len(rows) == 1 and rows[0].share == 0.5  # 1 of 2 combos


def test_type_signatures_plan_has_no_window(spark):
    """The argmax-with-tiebreak is deliberately two AGGREGATES (max
    support, then min type-pair among ties) so hot predicates collapse
    map-side — a row_number window would funnel every typed triple of
    a hot predicate through one reducer."""
    triples = spark.createDataFrame([("a", "p", "x")], TRIPLE)
    types = spark.createDataFrame(
        [("a", "t"), ("x", "u")], "entity string, type string"
    )
    df = relation_type_signatures(triples, types)
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Window" not in plan


def test_temporal_scope(spark):
    t = spark.createDataFrame(
        [
            ("a", "p", "b", 10), ("a", "p", "b", 30),
            ("a", "p", "b", 30), ("c", "p", "d", 5),
        ],
        "subj string, pred string, obj string, ts long",
    )
    got = {
        (r.subj, r.obj): (r.first_seen, r.last_seen, r.n_obs, r.n_moments)
        for r in temporal_scope(t).collect()
    }
    assert got == {("a", "b"): (10, 30, 3, 2), ("c", "d"): (5, 5, 1, 1)}


def _canon(spark, rows, **kw):
    df = spark.createDataFrame(rows, TRIPLE)
    return {
        (r.subj, r.pred, r.obj): (r.support, r.n_variants)
        for r in canonicalize_predicates(df, **kw).collect()
    }


def test_canonicalize_merges_full_paraphrases(spark):
    got = _canon(
        spark,
        [
            ("a", "married", "b"), ("a", "wed", "b"),
            ("c", "married", "d"), ("c", "wed", "d"),
            ("e", "knows", "f"),
        ],
    )
    # married < wed -> canonical name "married"; knows untouched
    assert got == {
        ("a", "married", "b"): (2, 2),
        ("c", "married", "d"): (2, 2),
        ("e", "knows", "f"): (1, 1),
    }


def test_canonicalize_threshold_keeps_weak_pairs_apart(spark):
    rows = [
        ("a", "p", "b"), ("a", "q", "b"),   # overlap 1
        ("c", "p", "d"), ("e", "q", "f"),   # sizes 2,2 -> jaccard 1/3
    ]
    got = _canon(spark, rows, min_jaccard=0.5)
    assert ("a", "p", "b") in got and ("a", "q", "b") in got
    got_low = _canon(spark, rows, min_jaccard=0.3)
    assert ("a", "q", "b") not in got_low  # folded into p
    assert got_low[("a", "p", "b")] == (2, 2)


CLAIM = "subj string, pred string, obj string, source string"


def _claims(spark):
    rows = []
    # three reliable sources assert 10 shared facts
    for i in range(10):
        for s in ("g0", "g1", "g2"):
            rows.append((f"s{i}", "born_in", f"city{i}", s))
    # a lone source contradicts two of them and adds one of its own
    rows += [
        ("s0", "born_in", "WRONG0", "bad"),
        ("s1", "born_in", "WRONG1", "bad"),
        ("s2", "born_in", "city2", "bad"),
    ]
    return spark.createDataFrame(rows, CLAIM)


def test_truth_finding_round1_is_vote_count(spark):
    out = truth_finding(_claims(spark), n_iters=1)
    got = {(r.subj, r.obj): (r.n_sources, r.confidence) for r in out.collect()}
    # round 1: trust==1 -> confidence = n_sources / max(n_sources)
    assert got[("s2", "city2")] == (4, 1.0)
    assert got[("s0", "city0")] == (3, 0.75)
    assert got[("s0", "WRONG0")] == (1, 0.25)


def test_truth_finding_reinforcement_separates_sources(spark):
    out = truth_finding(_claims(spark), n_iters=5)
    got = {(r.subj, r.obj): r.confidence for r in out.collect()}
    assert max(got.values()) == 1.0
    # corroborated facts beat the lone source's contradictions
    assert got[("s0", "city0")] > got[("s0", "WRONG0")]
    trust = {
        r.source: r.trust
        for r in truth_finding(
            _claims(spark), n_iters=5, return_trust=True
        ).collect()
    }
    assert trust["g0"] == trust["g1"] == trust["g2"] == 1.0
    assert trust["bad"] < 0.5
    # reinforcement demotes the bad source BELOW its round-1 vote share
    t1 = {
        r.source: r.trust
        for r in truth_finding(
            _claims(spark), n_iters=1, return_trust=True
        ).collect()
    }
    assert trust["bad"] < t1["bad"]


def test_truth_finding_partitioning_invariance(spark):
    base = _claims(spark)
    a = truth_finding(base.repartition(1), n_iters=3).collect()
    b = truth_finding(base.repartition(13, "source"), n_iters=3).collect()
    ka = {(r.subj, r.obj): r.confidence for r in a}
    kb = {(r.subj, r.obj): r.confidence for r in b}
    assert ka == kb  # bit-identical, not just close


def test_truth_finding_duplicate_claims_count_once(spark):
    c = spark.createDataFrame(
        [("a", "p", "b", "s1"), ("a", "p", "b", "s1"),
         ("a", "p", "c", "s2")],
        CLAIM,
    )
    got = {(r.subj, r.obj): r.n_sources for r in truth_finding(c, 1).collect()}
    assert got == {("a", "b"): 1, ("a", "c"): 1}
