"""AMIE-style rule mining (operators/rule_mining.py): Horn-rule
metrics (support / head-coverage / standard & PCA confidence) checked
against hand-computed values on a KG with a planted transitivity
rule, incompleteness that only PCA confidence forgives, and a
forward-chaining step whose output is exactly the missing
conclusions."""

from knowledge_harvest_from_lms_spark.operators.rule_mining import (
    apply_rules,
    mine_path_rules,
)

EDGE = "src string, rel string, dst string"


def _kg(spark):
    """4 cities in 2 nations, nations in regions. in_region is known
    for cities c1 and c2 only — the KG is INCOMPLETE for c3/c4, which
    is what separates standard confidence from PCA confidence."""
    return spark.createDataFrame(
        [
            ("c1", "in_nation", "n1"), ("c2", "in_nation", "n1"),
            ("c3", "in_nation", "n2"), ("c4", "in_nation", "n2"),
            ("n1", "in_region", "r1"), ("n2", "in_region", "r2"),
            ("c1", "in_region", "r1"), ("c2", "in_region", "r1"),
            # noise: a follows chain contributing other path types
            ("c1", "follows", "c2"), ("c2", "follows", "c3"),
        ],
        EDGE,
    )


def _rule(rows, rel1, rel2, head):
    hits = [r for r in rows if (r.rel1, r.rel2, r.head) == (rel1, rel2, head)]
    assert len(hits) == 1, (rel1, rel2, head, rows)
    return hits[0]


def test_amie_metrics_hand_computed(spark):
    rows = mine_path_rules(_kg(spark)).collect()
    r = _rule(rows, "in_nation", "in_region", "in_region")
    # body pairs: every (city, region) through its nation = 4
    # head in_region pairs: n1/n2/c1/c2 = 4; support: c1, c2 = 2
    assert (r.support, r.n_body, r.head_size) == (2, 4, 4)
    assert r.confidence == 0.5
    assert r.head_coverage == 0.5
    # PCA: only body pairs whose SUBJECT has a known in_region edge
    # count in the denominator -> c1, c2 -> confidence becomes 1.0
    assert (r.pca_body, r.pca_confidence) == (2, 1.0)


def test_min_support_and_confidence_filter(spark):
    kg = _kg(spark)
    all_rules = {
        (r.rel1, r.rel2, r.head)
        for r in mine_path_rules(kg).collect()
    }
    kept = {
        (r.rel1, r.rel2, r.head)
        for r in mine_path_rules(kg, min_support=2, min_confidence=0.5)
        .collect()
    }
    assert kept == {("in_nation", "in_region", "in_region")}
    # every kept rule is a subset of the unfiltered set
    assert kept <= all_rules


def test_support_counts_pairs_not_paths(spark):
    # two parallel mid vertices -> 2 path instances, ONE (x, y) pair
    edges = spark.createDataFrame(
        [
            ("x", "r1", "m1"), ("m1", "r2", "y"),
            ("x", "r1", "m2"), ("m2", "r2", "y"),
            ("x", "h", "y"),
        ],
        EDGE,
    )
    r = _rule(mine_path_rules(edges).collect(), "r1", "r2", "h")
    assert (r.support, r.n_body) == (1, 1)
    assert r.confidence == 1.0


def test_apply_rules_infers_exactly_the_gap(spark):
    kg = _kg(spark)
    rules = mine_path_rules(kg)
    out = apply_rules(kg, rules, min_pca_confidence=0.9).collect()
    got = {(r.src, r.rel, r.dst): (r.confidence, r.n_rules) for r in out}
    # the transitivity rule (pca 1.0) fires for all 4 cities; c1/c2's
    # regions are known edges and leave via LEFT ANTI -> c3/c4 only
    assert got == {
        ("c3", "in_region", "r2"): (1.0, 1),
        ("c4", "in_region", "r2"): (1.0, 1),
    }


def test_apply_rules_confidence_is_max_over_fired_rules(spark):
    # two rules conclude the same head pair with different PCA
    # confidence -> the conclusion carries the MAX, and n_rules = 2;
    # apply_rules takes any (rel1, rel2, head, pca_confidence) table,
    # so pin the confidences directly instead of engineering a KG
    # whose mined values happen to differ
    edges = spark.createDataFrame(
        [
            ("x", "a1", "m"), ("m", "a2", "y"),     # rule A body
            ("x", "b1", "k"), ("k", "b2", "y"),     # rule B body
        ],
        EDGE,
    )
    rules = spark.createDataFrame(
        [("a1", "a2", "h", 0.4), ("b1", "b2", "h", 0.9)],
        "rel1 string, rel2 string, head string, pca_confidence double",
    )
    out = apply_rules(edges, rules).collect()
    got = {(r.src, r.rel, r.dst): (r.confidence, r.n_rules) for r in out}
    assert got[("x", "h", "y")] == (0.9, 2)
    # the threshold drops rule A entirely -> only B fires
    out2 = apply_rules(edges, rules, min_pca_confidence=0.5).collect()
    got2 = {(r.src, r.rel, r.dst): (r.confidence, r.n_rules) for r in out2}
    assert got2[("x", "h", "y")] == (0.9, 1)


def test_rules_plan_has_no_window_or_cartesian(spark):
    plan = (
        mine_path_rules(_kg(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
