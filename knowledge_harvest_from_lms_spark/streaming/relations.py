"""Streaming relation harvest: relation_info records arriving as a
stream → beam-harvest ONLY the not-yet-harvested relations, append
their triples.

Closes the last sliver of ROADMAP item 5 ("streaming the BEAM
itself"). The beam is an iterative batch algorithm (per-depth
DataFrame joins + an eager checkpoint per level) and cannot run
inside a single streaming query plan, so the stream wraps it with
``foreachBatch`` — the standard Structured Streaming pattern for
batch-only algorithms — and gets exactly-once *effects* from two
pieces:

  * the checkpointLocation gives at-least-once micro-batch replay;
  * a driver-side ledger (``<out>/harvested_rels`` parquet) makes the
    replay idempotent: every relation that already reached the ledger
    is anti-joined out of the batch before the harvest runs, so a
    crashed-and-replayed batch re-harvests only relations whose
    triples never committed. Triples commit BEFORE the ledger row, so
    a crash between the two writes re-runs that relation's harvest
    and overwrites its partition (idempotent per-rel dynamic
    partition overwrite), never duplicates it.

Relation drops are tiny dimension records (tens of rows); collecting
a micro-batch to the driver mirrors ``relations_from_records``'s
deliberate tiny-dim design (sources/relations.py:44-55) and is not a
scale concern — the heavy work (the beam) stays fully distributed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..config import HarvestConfig
from ..fsutil import hadoop_exists, stage_overwrite_all

# relation_info drop schema = RELATION_SCHEMA minus the derived n_ents
RELATION_DROP_SCHEMA = T.StructType(
    [
        T.StructField("rel", T.StringType(), False),
        T.StructField("init_prompts", T.ArrayType(T.StringType()), False),
        T.StructField("prompts", T.ArrayType(T.StringType()), True),
        T.StructField(
            "seed_ent_tuples", T.ArrayType(T.ArrayType(T.StringType())), False
        ),
    ]
)


def read_relation_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(RELATION_DROP_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(drop_dir)
    )


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, "harvested_rels")


def _triples_path(out_dir: str) -> str:
    return os.path.join(out_dir, "triples")


def harvested_rels(sess: SparkSession, out_dir: str) -> set[str]:
    from ..txn import TxnLog, is_txn_root

    if is_txn_root(sess, out_dir):
        log = TxnLog(sess, out_dir)
        if not log.has_table("harvested_rels"):
            return set()
        return {
            r.rel for r in log.read("harvested_rels").select("rel").collect()
        }
    path = _ledger_path(out_dir)
    if not hadoop_exists(sess, path):
        return set()
    # mergeSchema: ledgers written before r3-late lack the n_triples
    # column; without merging, schema inference from one old file
    # would hide it from metrics consumers on upgraded out_dirs
    return {
        r.rel
        for r in sess.read.option("mergeSchema", "true")
        .parquet(path).select("rel").collect()
    }


def _commit_batch_txn(
    sess: SparkSession,
    out_dir: str,
    new: list,
    new_triples: DataFrame,
    all_triples: DataFrame,
    batch_id: int,
    sim_threshold: float,
    graph_enabled: bool,
) -> None:
    """One atomic TxnLog commit per drained micro-batch: the merged
    graph (vertices + edges), the band/deletion-variant index DELTAS
    for exactly this batch's new vertices, and the ledger rows all
    become visible together. A crash anywhere before the manifest
    rename leaves the previous generation fully intact (plus garbage
    dirs for vacuum); the replayed batch then recomputes from that
    consistent snapshot — so the multi-hop near-dup chains that could
    split across the plain layout's vertex/edge promote window cannot
    split here."""
    from pyspark.sql import functions as F

    from ..txn import TxnLog

    log = TxnLog(sess, out_dir)
    overwrites: dict[str, DataFrame] = {}
    appends: dict[str, DataFrame] = {}
    if graph_enabled:
        from ..operators.entity_linking import _norm, build_variant_index
        from ..operators.graph import (
            build_vertex_band_index,
            materialize_graph,
            merge_into_graph,
        )

        if log.has_table("vertices"):
            ev = log.read("vertices")
            # replay safety: this batch's relations own their edges
            ee = log.read("edges").filter(
                ~F.col("rel").isin([r["rel"] for r in new])
            )
            idx = None
            if log.has_table("vertex_bands") and log.has_table("vertex_variants"):
                idx = {
                    "bands": log.read("vertex_bands"),
                    "variants": log.read("vertex_variants"),
                }
            g = merge_into_graph(
                ev, ee, new_triples, sim_threshold, vertex_index=idx
            )
        else:
            # first build backfills from the FULL triples table (the
            # log may be enabled after earlier relations were already
            # harvested under it)
            g = materialize_graph(all_triples, sim_threshold)
        # eager: the vertex plan feeds its own generation write AND
        # both index-delta computations below
        gv = g["vertices"].localCheckpoint(eager=True)
        overwrites["vertices"] = gv
        overwrites["edges"] = g["edges"]
        names = gv.select("ent")
        if log.has_table("vertex_bands"):
            names = names.join(
                log.read("vertex_bands").select("ent").distinct(),
                "ent", "left_anti",
            )
        appends["vertex_bands"] = build_vertex_band_index(
            names, sim_threshold
        ).coalesce(1)
        vnorms = gv.select(_norm(F.col("ent")).alias("v_norm")).distinct()
        if log.has_table("vertex_variants"):
            vnorms = vnorms.join(
                log.read("vertex_variants").select("v_norm").distinct(),
                "v_norm", "left_anti",
            )
        appends["vertex_variants"] = build_variant_index(
            vnorms.select(F.col("v_norm").alias("name"))
        ).coalesce(1)
    counts = {
        r["rel"]: r["n"]
        for r in new_triples.groupBy("rel")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    appends["harvested_rels"] = sess.createDataFrame(
        [(r["rel"], int(batch_id), int(counts.get(r["rel"], 0))) for r in new],
        "rel string, batch_id long, n_triples long",
    ).coalesce(1)
    log.commit(
        overwrites=overwrites, appends=appends,
        meta={"batch_id": int(batch_id), "rels": [r["rel"] for r in new]},
    )


def harvest_relation_stream(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: HarvestConfig | None = None,
    available_now: bool = True,
    graph_dir: str | None = None,
    sim_threshold: float = 0.7,
    txn: bool = False,
):
    """Start (and with available_now=True, drain) the relation-harvest
    stream; returns the StreamingQuery. Works as a cron'd batch
    (availableNow) or a long-running stream.

    With ``graph_dir`` set, each drained batch also maintains the
    materialized vertex/edge graph incrementally: the new relations'
    triples merge via ``merge_into_graph`` (surface forms link to
    existing vertices — ids stay stable; only unlinked forms
    cluster). Replay safety piggybacks on per-relation edge
    ownership: an edge's ``rel`` column names the relation that
    produced it, so a replayed relation REPLACES its own edges
    (anti-join on rel before the merge) instead of double-counting
    them.

    ``txn=True`` routes every sink table except the triples through
    ONE :class:`~..txn.TxnLog` commit per micro-batch, rooted at
    ``out_dir``: vertices + edges + band/variant indexes + the ledger
    row become visible TOGETHER or not at all — closing the
    mixed-generation crash windows the plain layout documents
    (fsutil.stage_overwrite_all; merge_into_graph's multi-hop
    replay caveat). In this mode ``graph_dir`` only enables the graph
    branch — the graph tables live inside ``out_dir``'s log, read via
    ``TxnLog(sess, out_dir).read("vertices")``. The triples table
    stays a plain per-rel dynamic-partition-overwrite parquet: its
    replay story is already idempotent (a replayed relation rewrites
    its own partitions before the ledger row can exist), and keeping
    it out of the log means a 10^12-row fact table never inflates the
    manifest. Index self-healing is unnecessary here: the index
    deltas commit atomically WITH the vertices they cover."""
    cfg = cfg or HarvestConfig()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window as W

        from ..plans.harvest import harvest
        from ..sources.relations import relations_from_records

        sess = batch_df.sparkSession
        # one definition per rel, DETERMINISTICALLY: if one micro-batch
        # carries two different definitions of the same relation (e.g.
        # a corrected re-drop landing alongside the original), pick the
        # greatest serialized record — arbitrary but stable, instead of
        # whichever file Spark happened to list first (review r3)
        pick = W.partitionBy("rel").orderBy(
            F.to_json(
                F.struct("init_prompts", "prompts", "seed_ent_tuples")
            ).desc()
        )
        recs = (
            batch_df.withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .collect()
        )
        done = harvested_rels(sess, out_dir)
        new = [r for r in recs if r["rel"] not in done]
        if not new:
            return
        rels = relations_from_records(
            sess,
            [
                {
                    "rel": r["rel"],
                    "init_prompts": list(r["init_prompts"]),
                    "prompts": list(r["prompts"] or []),
                    "seed_ent_tuples": [list(t) for t in r["seed_ent_tuples"]],
                }
                for r in new
            ],
        )
        triples = harvest(sess, rels, cfg)["triples"]
        # per-rel dynamic partition overwrite: a replayed batch that
        # crashed after this write but before the ledger append simply
        # rewrites the same relations' partitions — no duplicates
        (
            triples.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("rel")
            .parquet(_triples_path(out_dir))
        )
        # one read of the just-committed table, shared by the graph
        # branch and the ledger counts. Explicit schema: (a) an
        # all-empty first write leaves a parquet dir with no files,
        # which schema inference cannot read (UNABLE_TO_INFER_SCHEMA —
        # review r3); (b) it pins the rel partition column to string,
        # so numeric-looking relation names don't get type-inferred
        # into ints
        all_triples = sess.read.schema(triples.schema).parquet(
            _triples_path(out_dir)
        )
        new_triples = all_triples.filter(
            F.col("rel").isin([r["rel"] for r in new])
        )
        if txn:
            _commit_batch_txn(
                sess, out_dir, new, new_triples, all_triples,
                batch_id, sim_threshold,
                graph_enabled=graph_dir is not None,
            )
            return
        if graph_dir is not None:
            from ..operators.entity_linking import _norm, build_variant_index
            from ..operators.graph import (
                build_vertex_band_index,
                materialize_graph,
                merge_into_graph,
            )

            vpath = os.path.join(graph_dir, "vertices")
            epath = os.path.join(graph_dir, "edges")
            bpath = os.path.join(graph_dir, "vertex_bands")
            wpath = os.path.join(graph_dir, "vertex_variants")
            if hadoop_exists(sess, vpath):
                ev = sess.read.parquet(vpath)
                # replay safety: this batch's relations own their edges
                ee = sess.read.parquet(epath).filter(
                    ~F.col("rel").isin([r["rel"] for r in new])
                )
                # persisted side tables (ADVICE r3): the merge probes
                # the stored band/deletion-variant indexes instead of
                # re-shingling / re-exploding every existing vertex.
                # Built at the SAME sim_threshold (banding layout
                # derives from it).
                idx = None
                if hadoop_exists(sess, bpath) and hadoop_exists(sess, wpath):
                    idx = {
                        "bands": sess.read.parquet(bpath),
                        "variants": sess.read.parquet(wpath),
                    }
                g = merge_into_graph(
                    ev, ee, new_triples, sim_threshold, vertex_index=idx
                )
            else:
                # first graph build BACKFILLS from the full triples
                # table, not just this batch: graph_dir may be enabled
                # after earlier relations were already harvested and
                # ledgered — those would otherwise never reach the
                # graph (review r3)
                g = materialize_graph(all_triples, sim_threshold)
            stage_overwrite_all([(g["vertices"], vpath), (g["edges"], epath)])
            # maintain the side tables AFTER the graph promote, by
            # SELF-HEALING append: (re)index exactly the vertices the
            # stored index doesn't cover — this batch's new vertices
            # in the steady state, and also anything lost to a crash
            # between the graph promote and this append on a previous
            # run (duplicate index rows from a replay are harmless —
            # the candidate joins dedup; missing rows would silently
            # degrade link recall, so missing is the failure mode this
            # heals). Banding/variant explosion is row-local: append
            # over the missing set ≡ full rebuild (tested).
            verts = sess.read.parquet(vpath)
            names = verts.select("ent")
            if hadoop_exists(sess, bpath):
                names = names.join(
                    sess.read.parquet(bpath).select("ent").distinct(),
                    "ent", "left_anti",
                )
            build_vertex_band_index(names, sim_threshold).coalesce(1).write.mode(
                "append"
            ).parquet(bpath)
            vnorms = verts.select(_norm(F.col("ent")).alias("v_norm")).distinct()
            if hadoop_exists(sess, wpath):
                vnorms = vnorms.join(
                    sess.read.parquet(wpath).select("v_norm").distinct(),
                    "v_norm", "left_anti",
                )
            build_variant_index(
                vnorms.select(F.col("v_norm").alias("name"))
            ).coalesce(1).write.mode("append").parquet(wpath)
        # ledger rows carry per-relation triple counts — the streaming
        # analog of the batch pipeline's per-stage manifest metrics
        # (operators/checkpoint.py), so lineage survives on this path
        # too. Counted from the committed table (not the in-memory
        # harvest plan, which would re-run the beam)
        counts = {
            r["rel"]: r["n"]
            for r in new_triples.groupBy("rel")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        sess.createDataFrame(
            [(r["rel"], int(batch_id), int(counts.get(r["rel"], 0))) for r in new],
            "rel string, batch_id long, n_triples long",
        ).coalesce(1).write.mode("append").parquet(_ledger_path(out_dir))

    writer = (
        read_relation_stream(spark, drop_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
