"""Physical-plan shape guards: the plans we'd want at 100TB, asserted
so they can't silently regress.

- filters/column pruning reach the parquet scan (PushedFilters /
  ReadSchema)
- small dims broadcast (BroadcastHashJoin), big joins stay shuffled
- global top-k compiles to TakeOrderedAndProject
- anti/semi joins are real anti/semi joins
"""

import pytest

from knowledge_harvest_from_lms_spark.plans.queries import QUERIES

from conftest import SF_SMALL


def plan_of(df, mode="formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_q01_filter_pushed_to_scan(spark):
    plan = plan_of(QUERIES["q01_pricing_summary"](spark, SF_SMALL))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: html-wide table not involved; scan reads only
    # the 7 needed lineitem columns
    assert "l_comment" not in plan


def test_q02_dims_broadcast(spark):
    plan = plan_of(QUERIES["q02_revenue_by_nation"](spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastExchange" in plan


def test_q04_take_ordered(spark):
    plan = plan_of(QUERIES["q04_global_top200"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_q07_left_anti(spark):
    plan = plan_of(QUERIES["q07_anti_join"](spark, SF_SMALL))
    assert "LeftAnti" in plan


def test_q08_left_semi(spark):
    plan = plan_of(QUERIES["q08_semi_join"](spark, SF_SMALL))
    assert "LeftSemi" in plan


def test_q19_column_pruning(spark):
    plan = plan_of(QUERIES["q19_token_count"](spark, SF_SMALL))
    # only text+lang should be read from documents
    assert "ReadSchema" in plan
    assert "doc_id" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q28_two_phase_agg(spark):
    plan = plan_of(QUERIES["q28_salted_word_count"](spark, SF_SMALL))
    # salted partial + final -> at least two distinct HashAggregate pairs
    assert plan.count("HashAggregate") >= 4


def test_q15_broadcast_anchor_side(spark):
    plan = plan_of(QUERIES["q15_cosine_topk"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q23_topk_and_partial_agg(spark):
    plan = plan_of(QUERIES["q23_cooccur_triples"](spark, SF_SMALL), mode="simple")
    # rank<=5 pushes into WindowGroupLimit (partial+final) and the
    # count has a map-side combine — the shapes that matter at scale
    assert "WindowGroupLimit" in plan
    assert "partial_count" in plan
