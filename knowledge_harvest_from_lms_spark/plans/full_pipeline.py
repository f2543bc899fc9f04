"""The complete north-rule pipeline, checkpointed stage by stage:

  web_pages ─extract→ corpus ─┐
  relations ─weights→ beam → rescore ─ground→ grounded ─graph→ KG

Every stage goes through operators/checkpoint.run_stage: a rerun with
the same config fingerprint resumes from the stage outputs without
recomputation (exact resume, north_star), and each manifest records
row counts + per-partition counts (lineage metrics A9).
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import HarvestConfig
from ..operators.beam_search import finalize_candidates, search_ent_tuples
from ..operators.checkpoint import run_stage
from ..operators.corpus_grounding import ground_triples
from ..operators.extract_text import extract_text
from ..operators.graph import materialize_graph, pagerank
from ..operators.prompt_weights import compute_prompt_weights
from ..operators.rescoring import rescore_and_rank


def _fp(*parts) -> str:
    h = hashlib.blake2b(digest_size=8)
    for p in parts:
        h.update(repr(p).encode())
    return h.hexdigest()


def run_full_pipeline(
    spark: SparkSession,
    relations: DataFrame,
    web_pages: DataFrame,
    base_dir: str,
    cfg: HarvestConfig | None = None,
    min_mentions: int = 0,
) -> dict[str, DataFrame]:
    import os

    cfg = cfg or HarvestConfig()
    cfg_fp = _fp(cfg)
    # config-scoped run directory: two configs never clobber each
    # other's stage outputs (a DataFrame returned from run A stays
    # readable after run B), and the same config always resumes
    base_dir = os.path.join(base_dir, f"run-{cfg_fp}")

    corpus = run_stage(
        spark, base_dir, "10_extract",
        lambda: extract_text(web_pages, passthrough=("warc_ts", "lang")),
        fingerprint=_fp("extract", cfg.seed),
    )

    pw = run_stage(
        spark, base_dir, "20_prompt_weights",
        lambda: compute_prompt_weights(relations, cfg),
        fingerprint=cfg_fp,
    )

    allowed_token_ids = None
    if cfg.ground_beam_to_corpus:
        if cfg.ground_beam_to_corpus not in (True, "per_relation"):
            # a typo ("per-relation") must not silently fall back to
            # global grounding with a healthy-looking run
            raise ValueError(
                "ground_beam_to_corpus must be False, True (global) or "
                f"'per_relation'; got {cfg.ground_beam_to_corpus!r}"
            )
        from ..lm import resolve_lm
        from ..operators.corpus_grounding import (
            corpus_token_ids,
            corpus_token_ids_per_relation,
        )

        pages_text = corpus.withColumnRenamed("extracted_text", "text")
        if cfg.ground_beam_to_corpus == "per_relation":
            allowed_token_ids = corpus_token_ids_per_relation(
                pages_text, relations, resolve_lm(cfg.lm, cfg.seed),
                cooccur_window=cfg.grounding_cooccur_window,
            )
        else:
            allowed_token_ids = corpus_token_ids(
                pages_text, resolve_lm(cfg.lm, cfg.seed)
            )

    ground_tag = ""
    if allowed_token_ids is not None:
        ground_tag = (
            "grounded_per_rel"
            if cfg.ground_beam_to_corpus == "per_relation"
            else "grounded"
        )
    cand = run_stage(
        spark, base_dir, "30_candidates",
        lambda: finalize_candidates(
            search_ent_tuples(spark, pw, relations, cfg, allowed_token_ids), cfg
        ),
        fingerprint=_fp(cfg_fp, ground_tag),
    )

    triples = run_stage(
        spark, base_dir, "40_triples",
        lambda: rescore_and_rank(cand, pw, cfg),
        fingerprint=cfg_fp,
        partition_by=["rel"],
    )

    grounded = run_stage(
        spark, base_dir, "50_grounded",
        lambda: ground_triples(
            triples.select("rel", "ents", "weight"),
            corpus.withColumnRenamed("extracted_text", "text"),
            min_mentions=min_mentions,
        ),
        fingerprint=_fp(cfg_fp, min_mentions),
    )

    def _graph():
        g = materialize_graph(
            grounded.select("rel", "ents", "weight"), sim_threshold=0.7
        )
        return g["edges"]

    edges = run_stage(
        spark, base_dir, "60_edges", _graph, fingerprint=_fp(cfg_fp, "graph"),
        partition_by=["rel"],
    )
    vertices = run_stage(
        spark, base_dir, "61_vertices",
        lambda: edges.select(F.col("src_id").alias("ent_id"), F.col("src").alias("ent"))
        .union(edges.select(F.col("dst_id"), F.col("dst")))
        .distinct(),
        fingerprint=_fp(cfg_fp, "vertices"),
    )

    pr_iters, pr_damping = 5, 0.85
    ranks = run_stage(
        spark, base_dir, "62_ranks",
        lambda: pagerank(
            edges.select("src", "dst", "weight"),
            iters=pr_iters, damping=pr_damping,
        ),
        # fingerprint carries the actual parameters (like min_mentions
        # above): changing damping must invalidate the checkpoint, not
        # silently resume stale ranks (review r3)
        fingerprint=_fp(cfg_fp, f"pagerank-{pr_iters}-{pr_damping}"),
    )
    # inner join: 61_vertices is the distinct endpoint set of the SAME
    # edge table 62_ranks ran over, so every vertex has a rank; a left
    # join + coalesce(0.0) would mask a future key mismatch as silent
    # zero ranks instead of a visible row-count drop (review r3)
    vertices = vertices.join(
        ranks.select(F.col("node").alias("ent"), "rank"), "ent"
    ).select("ent_id", "ent", "rank")

    return {
        "corpus": corpus,
        "prompt_weights": pw,
        "candidates": cand,
        "triples": triples,
        "grounded": grounded,
        "edges": edges,
        "vertices": vertices,
    }


def publish_outputs_txn(
    spark: SparkSession,
    outputs: dict[str, DataFrame],
    root: str,
    meta: dict | None = None,
) -> int:
    """Atomically publish the pipeline's consumer-facing tables
    (triples, grounded, edges, vertices) into a :class:`~..txn.TxnLog`
    at ``root`` as ONE commit.

    The per-stage checkpoints under ``base_dir`` are single-table and
    resume-exact for the PIPELINE itself, but an external reader
    pointed at them during a re-run can observe a mixed set (new edges
    with old vertices). Publishing through the log gives downstream
    consumers the same single-pointer snapshot semantics the streaming
    ``txn=True`` path has: every table flips together, pinned snapshot
    reads keep working across republishes, and ``meta`` (e.g. the
    config fingerprint) records which run produced the snapshot.
    Returns the committed version (the snapshot id for lineage)."""
    from ..txn import TxnLog

    pub = {
        k: outputs[k]
        for k in ("triples", "grounded", "edges", "vertices")
        if k in outputs
    }
    if not pub:
        raise ValueError("no publishable tables in outputs")
    return TxnLog(spark, root).commit(overwrites=pub, meta=meta or {})
