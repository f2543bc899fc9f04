"""Deterministic sampling / token-budget mixing (q50 carries the
row-for-row oracle; these pin the properties the oracle can't)."""

import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.sampling import (
    deterministic_sample,
    sample_bucket,
    stratified_sample,
    token_budget_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("other").alias("lang"),
        (F.col("id") % 7 * 10 + 5).alias("n_tokens"),
    )


def test_stable_across_partitionings(spark):
    """THE property df.sample() lacks: the surviving set is identical
    under any partitioning (hence any cluster size / retry layout)."""
    df = _docs(spark)
    a = deterministic_sample(df.repartition(2), 0.3, "doc_id", seed=1)
    b = deterministic_sample(df.repartition(17), 0.3, "doc_id", seed=1)
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_rate_accuracy_and_seed_independence(spark):
    df = _docs(spark, 5000)
    kept = deterministic_sample(df, 0.3, "doc_id", seed=1).count()
    assert abs(kept / 5000 - 0.3) < 0.03
    s1 = {r.doc_id for r in deterministic_sample(df, 0.5, "doc_id", seed=1).collect()}
    s2 = {r.doc_id for r in deterministic_sample(df, 0.5, "doc_id", seed=2).collect()}
    assert s1 != s2
    overlap = len(s1 & s2) / 5000
    assert abs(overlap - 0.25) < 0.05  # independent seeds: P(both) = 0.25


def test_nested_rates_subset(spark):
    """rate=0.2 keeps a SUBSET of rate=0.5 at the same seed (bucket
    threshold is monotone) — lets curation tighten a budget without
    resampling the survivors' complement."""
    df = _docs(spark)
    small = {r.doc_id for r in deterministic_sample(df, 0.2, "doc_id", seed=3).collect()}
    big = {r.doc_id for r in deterministic_sample(df, 0.5, "doc_id", seed=3).collect()}
    assert small <= big


def test_stratified_rates_and_default(spark):
    df = _docs(spark, 3000)
    out = stratified_sample(
        df, {"en": 1.0}, "lang", "doc_id", seed=0, default_rate=0.0
    )
    got = out.groupBy("lang").count().collect()
    assert {r["lang"] for r in got} == {"en"}
    assert got[0]["count"] == 1000  # rate 1.0 keeps every en row


def test_portable_matches_xxhash_semantics_not_values(spark):
    """Both hashers implement the same contract (stable buckets in
    [0,1000)); their values differ — portable exists for the oracle."""
    df = _docs(spark, 500)
    bx = df.select(sample_bucket(F.col("doc_id"), 0, "xxhash64").alias("b"))
    bp = df.select(sample_bucket(F.col("doc_id"), 0, "portable").alias("b"))
    for rows in (bx.collect(), bp.collect()):
        assert all(0 <= r.b < 1000 for r in rows)
    with pytest.raises(ValueError, match="unknown hasher"):
        deterministic_sample(df, 0.5, "doc_id", hasher="md5")
    with pytest.raises(ValueError, match="rate"):
        deterministic_sample(df, 1.5, "doc_id")


def test_token_budget_mixture(spark):
    df = _docs(spark, 6000)
    totals = {
        r["lang"]: r["t"]
        for r in df.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    budget = sum(totals.values()) // 4
    sampled, rates = token_budget_sample(
        df, budget, "lang", "doc_id", "n_tokens",
        weights={"en": 0.5, "other": 0.5}, seed=11,
    )
    # realized tokens land near the budget (hash sampling is ~binomial)
    realized = sampled.agg(F.sum("n_tokens")).collect()[0][0]
    assert abs(realized - budget) / budget < 0.1
    # 50/50 target mixture from a 1/3-2/3 corpus: en keeps a higher rate
    assert rates["en"] > rates["other"]
    # over-budget stratum caps at 1.0, never re-normalized silently
    _, rates2 = token_budget_sample(
        df, sum(totals.values()) * 10, "lang", "doc_id", "n_tokens", seed=11
    )
    assert set(rates2.values()) == {1.0}


def test_zero_shuffle_plan(spark):
    df = _docs(spark)
    plan = (
        deterministic_sample(df, 0.5, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_q50_matches_manual_replay(spark):
    """The q50 Spark side equals a driver-side Python replay of the
    portable hash on a small slice (the DuckDB oracle does the same
    replay at sf scale)."""
    from knowledge_harvest_from_lms_spark.plans.queries import (
        q50_deterministic_sample,
    )

    out = {
        r.doc_id: (r.lang, r.bucket)
        for r in q50_deterministic_sample(spark, "/root/testdata/sf0.001").collect()
    }
    M = 1_000_000_007

    def bucket(key):
        acc = 0
        for ch in f"{key}#7":
            acc = (acc * 31 + ord(ch)) % M
        return acc % 1000

    for did, (lang, b) in list(out.items())[:50]:
        assert bucket(did) == b
        rate = {"en": 500, "de": 350}.get(lang, 200)
        assert b < rate


def test_weighted_reservoir_properties(spark):
    """A-ES reservoir: heavier rows win more often (aggregate over
    disjoint seeds), output is k per group, deterministic across
    partitionings, and the rank-limit compiles to WindowGroupLimit."""
    from pyspark.sql import functions as F

    from knowledge_harvest_from_lms_spark.operators.sampling import (
        weighted_reservoir,
    )

    # 400 rows, two groups (id%2), two weight classes per group:
    # w=9 (ids < 200) vs w=1 (ids >= 200)
    df = spark.range(400).select(
        F.col("id"),
        F.when(F.col("id") < 200, 9.0).otherwise(1.0).alias("w"),
        (F.col("id") % 2).cast("string").alias("grp"),
    )
    heavy_wins = total = 0
    for seed in range(8):
        out = weighted_reservoir(
            df, k=20, weight_col="w", key_col="id",
            group_cols=["grp"], seed=seed,
        ).collect()
        assert len(out) == 40
        assert {r["grp"] for r in out} == {"0", "1"}
        heavy_wins += sum(1 for r in out if r["id"] < 200)
        total += len(out)
    # E[heavy share] ~ 0.87 under A-ES with w 9:1; demand > 0.6
    assert heavy_wins / total > 0.6, heavy_wins / total

    a = weighted_reservoir(
        df.repartition(1), k=20, weight_col="w", key_col="id",
        group_cols=["grp"],
    ).collect()
    b = weighted_reservoir(
        df.repartition(16), k=20, weight_col="w", key_col="id",
        group_cols=["grp"],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    wr = weighted_reservoir(
        df, k=20, weight_col="w", key_col="id", group_cols=["grp"]
    )
    wr.collect()  # finalize the AQE plan before reading it
    assert "WindowGroupLimit" in wr._jdf.queryExecution().executedPlan().toString()


def test_weighted_reservoir_drops_nonpositive(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F  # noqa: F401

    from knowledge_harvest_from_lms_spark.operators.sampling import (
        weighted_reservoir,
    )

    df = spark.createDataFrame(
        [Row(id=1, w=2.0), Row(id=2, w=0.0), Row(id=3, w=-1.0),
         Row(id=4, w=None)]
    )
    out = weighted_reservoir(df, k=10, weight_col="w", key_col="id")
    assert [r["id"] for r in out.collect()] == [1]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        weighted_reservoir(df, k=0, weight_col="w", key_col="id")
