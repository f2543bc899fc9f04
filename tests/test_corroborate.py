"""Cross-source triple corroboration (operators/corroborate.py):
distinct-source counting, sorted stable source strings, weight
accumulation, min_sources gating, and the end-to-end composition
with the Hearst miner q105 exercises."""

from knowledge_harvest_from_lms_spark.operators.corroborate import (
    corroborate_triples,
)

SCHEMA = "subj string, rel string, obj string, source string, weight double"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_distinct_sources_and_sorted_string(spark):
    t = _rows(
        spark,
        [
            ("cat", "isa", "animal", "such_as", 3.0),
            ("cat", "isa", "animal", "copula_isa", 2.0),
            ("cat", "isa", "animal", "and_other", 1.0),
            ("dog", "isa", "animal", "such_as", 5.0),
        ],
    )
    got = {
        (r.subj, r.rel, r.obj): (r.n_sources, r.sources, r.total_weight)
        for r in corroborate_triples(t).collect()
    }
    assert got[("cat", "isa", "animal")] == (
        3,
        "and_other,copula_isa,such_as",
        6.0,
    )
    assert got[("dog", "isa", "animal")] == (1, "such_as", 5.0)


def test_duplicate_source_rows_count_once_but_weights_sum(spark):
    t = _rows(
        spark,
        [
            ("a", "r", "b", "s1", 1.0),
            ("a", "r", "b", "s1", 2.0),
        ],
    )
    [r] = corroborate_triples(t).collect()
    assert (r.n_sources, r.sources, r.total_weight) == (1, "s1", 3.0)


def test_min_sources_gates_after_aggregation(spark):
    t = _rows(
        spark,
        [
            ("a", "r", "b", "s1", 1.0),
            ("a", "r", "b", "s2", 1.0),
            ("c", "r", "d", "s1", 9.0),
        ],
    )
    got = corroborate_triples(t, min_sources=2).collect()
    assert len(got) == 1 and got[0].subj == "a"


def test_composes_with_hearst_patterns(spark):
    from pyspark.sql import functions as F

    from knowledge_harvest_from_lms_spark.operators.hearst import hearst_isa

    docs = spark.createDataFrame(
        [
            ("fruits such as apples. fruits including apples.",),
            ("apples, pears and other fruits.",),
        ],
        "text string",
    )
    t = hearst_isa(docs).select(
        F.col("hypo").alias("subj"),
        F.lit("isa").alias("rel"),
        F.col("hyper").alias("obj"),
        F.col("pattern").alias("source"),
        F.col("n").cast("double").alias("weight"),
    )
    got = {
        (r.subj, r.obj): (r.n_sources, r.sources)
        for r in corroborate_triples(t).collect()
    }
    assert got[("apples", "fruits")] == (
        3,
        "and_other,including,such_as",
    )
    assert got[("pears", "fruits")] == (1, "and_other")
