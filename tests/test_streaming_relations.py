"""Streaming relation harvest (streaming/relations.py): relation_info
drops → availableNow drain → per-relation triples, idempotent on
replay, batch-parity with the plain harvest()."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.sources.fixtures import FIXTURE_RELATIONS
from knowledge_harvest_from_lms_spark.streaming.relations import (
    RELATION_DROP_SCHEMA,
    harvest_relation_stream,
    harvested_rels,
)

CFG = HarvestConfig(
    max_n_ent_tuples=8, token_beam_width=6, max_ent_subwords=1,
    shuffle_partitions=8,
)


def _drop_df(spark, records):
    rows = [
        Row(
            rel=r["rel"],
            init_prompts=list(r["init_prompts"]),
            prompts=list(r.get("prompts", [])),
            seed_ent_tuples=[list(t) for t in r["seed_ent_tuples"]],
        )
        for r in records
    ]
    return spark.createDataFrame(rows, RELATION_DROP_SCHEMA)


@pytest.fixture(scope="module")
def stream_out(spark, tmp_path_factory):
    """One drained stream over two relation drops: first CapableOf,
    then a replayed CapableOf + new AtLocation."""
    base = tmp_path_factory.mktemp("relstream")
    drop, out, ckpt = str(base / "drop"), str(base / "out"), str(base / "ckpt")
    graph = str(base / "graph")

    _drop_df(spark, FIXTURE_RELATIONS[:1]).write.mode("append").parquet(drop)
    q = harvest_relation_stream(spark, drop, out, ckpt, CFG, graph_dir=graph)
    q.awaitTermination(300)
    first = spark.read.parquet(out + "/triples")
    n_first = first.count()
    verts_first = {r.ent: r.ent_id for r in spark.read.parquet(graph + "/vertices").collect()}

    # second drop: same CapableOf again (must be a no-op) + AtLocation
    _drop_df(spark, FIXTURE_RELATIONS[:2]).write.mode("append").parquet(drop)
    q2 = harvest_relation_stream(spark, drop, out, ckpt, CFG, graph_dir=graph)
    q2.awaitTermination(300)
    return {"out": out, "graph": graph, "n_first": n_first,
            "verts_first": verts_first}


def test_stream_harvests_new_relations_only(spark, stream_out):
    out = stream_out["out"]
    triples = spark.read.parquet(out + "/triples")
    rels = {r.rel for r in triples.select("rel").distinct().collect()}
    assert rels == {"CapableOf", "AtLocation"}
    assert harvested_rels(spark, out) == {"CapableOf", "AtLocation"}
    # the replayed CapableOf drop added no rows
    n_cap = triples.filter(F.col("rel") == "CapableOf").count()
    assert n_cap == stream_out["n_first"]


def test_stream_matches_batch_harvest(spark, stream_out):
    """Parity: streamed triples == one batch harvest() of the same
    relations (same config ⇒ same deterministic stub-LM beam)."""
    from knowledge_harvest_from_lms_spark.plans.harvest import harvest
    from knowledge_harvest_from_lms_spark.sources.relations import (
        relations_from_records,
    )

    rels = relations_from_records(spark, FIXTURE_RELATIONS[:2])
    batch = harvest(spark, rels, CFG)["triples"]
    streamed = spark.read.parquet(stream_out["out"] + "/triples")
    cols = ["rel", "ents", "score", "rank"]
    missing = [c for c in cols if c not in streamed.columns]
    assert not missing, (missing, streamed.columns)
    a = sorted(map(tuple, batch.select(*cols).collect()))
    b = sorted(map(tuple, streamed.select(*cols).collect()))
    assert a == b


def test_stream_maintains_incremental_graph(spark, stream_out):
    """graph_dir: batch 1 materializes, batch 2 MERGES — ids of
    batch-1 vertices stay stable and both relations' edges land."""
    graph = stream_out["graph"]
    verts = {r.ent: r.ent_id for r in spark.read.parquet(graph + "/vertices").collect()}
    edges = spark.read.parquet(graph + "/edges")
    rels = {r.rel for r in edges.select("rel").distinct().collect()}
    assert rels == {"CapableOf", "AtLocation"}
    # vertex ids from the first drained batch never changed
    for ent, vid in stream_out["verts_first"].items():
        assert verts[ent] == vid, ent
    # every edge endpoint id resolves to a vertex row
    ids = set(verts.values())
    for r in edges.collect():
        assert r.src_id in ids and r.dst_id in ids


def test_restart_on_drained_checkpoint_is_noop(spark, stream_out):
    out = stream_out["out"]
    before = spark.read.parquet(out + "/triples").count()
    ckpt = out.replace("/out", "/ckpt")
    q = harvest_relation_stream(
        spark, out.replace("/out", "/drop"), out, ckpt, CFG
    )
    q.awaitTermination(300)
    assert spark.read.parquet(out + "/triples").count() == before


def test_empty_partitioned_table_reads_with_explicit_schema(spark, tmp_path):
    """The regression mechanics behind review r3's empty-first-batch
    finding: a partitioned overwrite of ZERO rows leaves a dir that
    schema inference cannot read, but the explicit-schema read the
    stream uses returns an empty frame instead of raising."""
    import pytest
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("rel", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])
    path = str(tmp_path / "triples")
    empty = spark.createDataFrame([], schema)
    (empty.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("rel").parquet(path))
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        spark.read.parquet(path).count()  # inference fails
    assert spark.read.schema(schema).parquet(path).count() == 0


def test_ledger_records_triple_counts(spark, stream_out):
    led = spark.read.parquet(stream_out["out"] + "/harvested_rels")
    rows = {r.rel: r.n_triples for r in led.collect()}
    triples = spark.read.parquet(stream_out["out"] + "/triples")
    want = {r.rel: r.n for r in triples.groupBy("rel")
            .agg(F.count("*").alias("n")).collect()}
    assert rows == want and all(n > 0 for n in rows.values())


def test_stream_maintains_vertex_index_side_tables(spark, stream_out):
    """r4 (ADVICE r3): the drained stream persists the band +
    deletion-variant side tables beside the graph and keeps them
    COMPLETE — every vertex is banded and every vertex norm has its
    variant rows — so the next merge probes the stored index instead
    of re-shingling the vertex table. Append-equivalence to a fresh
    rebuild is the index's correctness bar."""
    from pyspark.sql import functions as F

    from knowledge_harvest_from_lms_spark.operators.entity_linking import (
        _norm,
        build_variant_index,
    )
    from knowledge_harvest_from_lms_spark.operators.graph import (
        build_vertex_band_index,
    )

    graph = stream_out["graph"]
    verts = spark.read.parquet(graph + "/vertices")
    bands = spark.read.parquet(graph + "/vertex_bands")
    variants = spark.read.parquet(graph + "/vertex_variants")

    # complete: no vertex missing from either index
    assert verts.select("ent").join(
        bands.select("ent").distinct(), "ent", "left_anti"
    ).count() == 0
    assert verts.select(_norm(F.col("ent")).alias("v_norm")).distinct().join(
        variants.select("v_norm").distinct(), "v_norm", "left_anti"
    ).count() == 0

    # accumulated appends ≡ one fresh rebuild (after dedup — replayed
    # appends may duplicate rows, which consumers tolerate)
    fresh_b = build_vertex_band_index(verts.select("ent"), 0.7)
    assert sorted(map(str, bands.dropDuplicates().collect())) == sorted(
        map(str, fresh_b.dropDuplicates().collect())
    )
    fresh_v = build_variant_index(verts.select(F.col("ent").alias("name")))
    assert sorted(map(str, variants.dropDuplicates().collect())) == sorted(
        map(str, fresh_v.dropDuplicates().collect())
    )
