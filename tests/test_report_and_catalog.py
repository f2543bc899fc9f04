"""Report rendering (S6 analog) + catalog shim round-trip."""

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.plans.report import (
    render_summary,
    summary_frame,
)
from knowledge_harvest_from_lms_spark.sources.catalog import Catalog


def _triples(spark, n=30):
    rows = [
        ("relA", [f"e{i}", f"f{i}"], float(n - i), 1.0 / (i + 1), i + 1)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "rel string, ents array<string>, score double, weight double, rank int"
    )


def test_summary_frame_shapes(spark):
    t = _triples(spark)
    sf = summary_frame(t, top_k=5, sample_k=5, seed=42)
    rows = sf.collect()
    tops = [r for r in rows if r.kind == "top"]
    samples = [r for r in rows if r.kind == "sample"]
    assert len(tops) == 5 and len(samples) == 5
    assert sorted(r.pos for r in tops) == [1, 2, 3, 4, 5]
    # seeded sample is deterministic
    again = {(r.kind, r.pos, tuple(r.ents)) for r in
             summary_frame(t, top_k=5, sample_k=5, seed=42).collect()}
    assert again == {(r.kind, r.pos, tuple(r.ents)) for r in rows}


def test_render_summary(spark):
    text = render_summary(_triples(spark), top_k=3, sample_k=2)
    assert "=== relA ===" in text
    assert "e0, f0" in text


def test_catalog_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    assert not cat.use_iceberg  # sandbox: parquet fallback
    t = _triples(spark)
    cat.save_triples(t)
    back = cat.load("triples")
    assert back.count() == 30
    assert set(back.columns) == set(t.columns)
    # dynamic partition overwrite: rewriting relA leaves row count stable
    cat.save_triples(t.filter(F.col("rank") <= 10))
    assert cat.load("triples").count() == 10


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Identically bucketed tables must sort-merge join with NO
    Exchange on either side — the co-located-join layout for url-keyed
    joins at 100TB."""
    from pyspark.sql import functions as F

    from knowledge_harvest_from_lms_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    pages = spark.range(500).select(
        F.concat(F.lit("http://x/"), F.col("id").cast("string")).alias("url"),
        F.lit("text body").alias("text"),
    )
    stats = spark.range(500).select(
        F.concat(F.lit("http://x/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 7).alias("quality"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        # at 100TB neither side broadcasts; force the same regime here
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        cat.save_bucketed(pages, "pages", "url", n_buckets=8)
        cat.save_bucketed(stats, "stats", "url", n_buckets=8)
        joined = cat.load_bucketed("pages").join(cat.load_bucketed("stats"), "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS kg_pages")
        spark.sql("DROP TABLE IF EXISTS kg_stats")


def test_iceberg_ddl_shapes(spark, tmp_path):
    from knowledge_harvest_from_lms_spark.sources.catalog import Catalog

    ddl = Catalog(spark, str(tmp_path / "wh")).iceberg_ddl()
    assert set(ddl) == {"web_pages", "triples", "edges", "vertices"}
    assert "PARTITIONED BY (days(warc_ts), bucket(256, url))" in ddl["web_pages"]
    assert "PARTITIONED BY (rel)" in ddl["triples"]
    for stmt in ddl.values():
        assert stmt.startswith("CREATE TABLE IF NOT EXISTS kg.")
        assert "USING iceberg" in stmt
