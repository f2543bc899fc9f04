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


# ---------------------------------------------------------------------------
# predicate_functionality / functional_violations
# ---------------------------------------------------------------------------

def test_functionality_measures_single_valuedness(spark):
    from knowledge_harvest_from_lms_spark.operators.kg_refine import (
        predicate_functionality,
    )

    triples = spark.createDataFrame(
        [
            # born_in: 3 subjects, one conflicted (2 objs)
            ("a", "born_in", "x"), ("b", "born_in", "y"),
            ("c", "born_in", "z"), ("c", "born_in", "w"),
            ("c", "born_in", "z"),  # duplicate sighting: distinct objs
            # visited: fully multi-valued
            ("a", "visited", "x"), ("a", "visited", "y"),
            ("a", "visited", "z"),
        ],
        TRIPLE,
    )
    got = {
        r.pred: (r.n_subjs, r.n_pairs, r.functionality, r.avg_objs)
        for r in predicate_functionality(triples).collect()
    }
    assert got == {
        "born_in": (3, 4, round(2 / 3, 6), round(4 / 3, 6)),
        "visited": (1, 3, 0.0, 3.0),
    }


def _viol(spark, rows, **kw):
    from knowledge_harvest_from_lms_spark.operators.kg_refine import (
        functional_violations,
    )

    df = spark.createDataFrame(rows, TRIPLE)
    return {
        (r.pred, r.subj): (
            r.n_objs, r.total_support, r.top_obj, r.top_support, r.objs
        )
        for r in functional_violations(df, **kw).collect()
    }


def test_violations_majority_resolution(spark):
    got = _viol(
        spark,
        [
            # 'a' asserts x twice, y once -> majority x
            ("a", "born_in", "x"), ("a", "born_in", "x"),
            ("a", "born_in", "y"),
            # 'b' is clean -> absent
            ("b", "born_in", "z"),
        ],
    )
    assert got == {("born_in", "a"): (2, 3, "x", 2, "x,y")}


def test_violations_tie_breaks_to_min_obj(spark):
    got = _viol(
        spark,
        [("a", "p", "m"), ("a", "p", "k"), ("a", "p", "m"),
         ("a", "p", "k")],
    )
    assert got == {("p", "a"): (2, 4, "k", 2, "k,m")}


def test_violations_objs_cap_binds(spark):
    got = _viol(
        spark,
        [("a", "p", o) for o in ("o1", "o2", "o3", "o4")],
        max_objs_listed=2,
    )
    assert got == {("p", "a"): (4, 4, "o1", 1, "o1,o2")}


def test_violations_gate_composes_with_functionality(spark):
    from knowledge_harvest_from_lms_spark.operators.kg_refine import (
        functional_violations,
        predicate_functionality,
    )

    triples = spark.createDataFrame(
        [
            ("a", "born_in", "x"), ("a", "born_in", "y"),
            ("b", "born_in", "x"), ("c", "born_in", "z"),
            ("u", "visited", "x"), ("u", "visited", "y"),
            ("v", "visited", "z"), ("w", "visited", "x"),
            ("w", "visited", "y"),
        ],
        TRIPLE,
    )
    fn = predicate_functionality(triples)
    functional = [
        r.pred for r in fn.filter(F.col("functionality") >= 0.6).collect()
    ]
    assert functional == ["born_in"]  # visited: 1/3 unambiguous
    conflicts = functional_violations(
        triples.filter(F.col("pred").isin(functional))
    )
    assert [
        (r.pred, r.subj) for r in conflicts.collect()
    ] == [("born_in", "a")]
