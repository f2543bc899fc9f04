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
    clean_corpus: bool | dict | None = None,
    substring_dedup: bool | dict | None = None,
) -> dict[str, DataFrame]:
    """``clean_corpus`` adds a Common-Crawl-hygiene stage between
    extraction and everything that consumes the corpus: URL
    canonicalization + latest-fetch-wins dedup per canonical page
    (recrawls and tracking-param spellings collapse, preserving the
    per-url byte-identity invariant on the SURVIVING fetch), then the
    Gopher quality gate (operators/quality_filter.py). Pass ``True``
    for Gopher defaults or a thresholds dict to override; the stage
    fingerprint carries the thresholds, and downstream corpus
    consumers' fingerprints carry the clean fingerprint — toggling
    cleaning can never resume a stale grounded/candidates checkpoint.

    ``substring_dedup`` adds the Lee-et-al exact-substring span
    removal (operators/substring_dedup.py) after cleaning: pass
    ``True`` for defaults or ``{"k": ..., "min_count": ...}``. This
    stage REWRITES surviving text (duplicated spans drop out), so it
    deliberately runs after the byte-identity-preserving clean stage
    and recomputes ``text_sha256`` over the deduped text — the
    invariant "text_sha256 == sha2(extracted_text)" holds at every
    stage boundary. Its fingerprint chains into every downstream
    corpus consumer like clean's does.
    """
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

    clean_fp = ""
    # identity check, not truthiness: clean_corpus={} means "clean
    # with pure Gopher defaults, no overrides" and must NOT silently
    # skip the stage the caller asked for
    if clean_corpus is not None and clean_corpus is not False:
        from ..functions.urls import canonicalize_url
        from ..operators.quality_filter import gopher_quality_filter

        th = clean_corpus if isinstance(clean_corpus, dict) else {}
        # fingerprint the EFFECTIVE rule set (defaults merged), not
        # just the overrides: a change to GOPHER_DEFAULTS (e.g. the
        # r4 paragraph rules) must invalidate resumed 15_clean
        # checkpoints, or an old run dir silently serves outputs
        # filtered by the old rules with the old schema (review r4)
        from ..operators.quality_filter import GOPHER_DEFAULTS

        clean_fp = _fp("clean", sorted({**GOPHER_DEFAULTS, **th}.items()))

        def _clean():
            from pyspark.sql.window import Window as W

            c = corpus.withColumn(
                "canonical_url", canonicalize_url(F.col("url"))
            )
            # latest fetch of each canonical page wins; url breaks
            # exact-timestamp ties deterministically
            pick = W.partitionBy("canonical_url").orderBy(
                F.col("warc_ts").desc(), F.col("url")
            )
            c = (
                c.withColumn("_rn", F.row_number().over(pick))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            return gopher_quality_filter(
                c,
                id_col="canonical_url",
                text_col="extracted_text",
                thresholds=th,
                keep_only=True,
                passthrough=(
                    "url", "warc_ts", "lang", "extracted_text", "text_sha256",
                ),
            )

        corpus = run_stage(
            spark, base_dir, "15_clean", _clean, fingerprint=clean_fp,
        )

    if substring_dedup is not None and substring_dedup is not False:
        from ..operators.substring_dedup import dedup_substrings

        sd = substring_dedup if isinstance(substring_dedup, dict) else {}
        unknown = set(sd) - {"k", "min_count"}
        if unknown:
            raise ValueError(f"unknown substring_dedup options: {unknown}")
        sd_k, sd_min = sd.get("k", 10), sd.get("min_count", 2)
        # chains clean_fp so toggling EITHER hygiene stage invalidates
        # this one and (via clean_fp below) every downstream consumer
        clean_fp = _fp("subdedup", sd_k, sd_min, clean_fp)
        _corpus_in = corpus

        def _subdedup():
            pt = tuple(
                c for c in _corpus_in.columns
                if c not in ("url", "extracted_text", "text_sha256")
            )
            out = dedup_substrings(
                _corpus_in, id_col="url", text_col="extracted_text",
                k=sd_k, min_count=sd_min, passthrough=pt,
            )
            return out.withColumn(
                "text_sha256", F.sha2("extracted_text", 256)
            )

        corpus = run_stage(
            spark, base_dir, "17_subdedup", _subdedup, fingerprint=clean_fp,
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
    # Fingerprints ACCUMULATE downstream: every stage's fingerprint
    # folds in the fingerprints of the stages it reads, so a change
    # anywhere upstream (corpus cleaning toggled, min_mentions moved)
    # invalidates exactly the suffix of the pipeline that consumed it
    # — resuming a stale checkpoint past a changed input is the bug
    # class the r3 pagerank-fingerprint review caught, closed here for
    # the whole chain. (candidates consume the corpus only when beam
    # grounding is on, so clean_fp enters cand_fp only then.)
    cand_fp = _fp(cfg_fp, ground_tag, clean_fp if allowed_token_ids is not None else "")
    cand = run_stage(
        spark, base_dir, "30_candidates",
        lambda: finalize_candidates(
            search_ent_tuples(spark, pw, relations, cfg, allowed_token_ids), cfg
        ),
        fingerprint=cand_fp,
    )

    triples_fp = _fp(cfg_fp, cand_fp)
    triples = run_stage(
        spark, base_dir, "40_triples",
        lambda: rescore_and_rank(cand, pw, cfg),
        fingerprint=triples_fp,
        partition_by=["rel"],
    )

    grounded_fp = _fp(cfg_fp, min_mentions, clean_fp, triples_fp)
    grounded = run_stage(
        spark, base_dir, "50_grounded",
        lambda: ground_triples(
            triples.select("rel", "ents", "weight"),
            corpus.withColumnRenamed("extracted_text", "text"),
            min_mentions=min_mentions,
        ),
        fingerprint=grounded_fp,
    )

    def _graph():
        g = materialize_graph(
            grounded.select("rel", "ents", "weight"), sim_threshold=0.7
        )
        return g["edges"]

    edges_fp = _fp(grounded_fp, "graph")
    edges = run_stage(
        spark, base_dir, "60_edges", _graph, fingerprint=edges_fp,
        partition_by=["rel"],
    )
    vertices = run_stage(
        spark, base_dir, "61_vertices",
        lambda: edges.select(F.col("src_id").alias("ent_id"), F.col("src").alias("ent"))
        .union(edges.select(F.col("dst_id"), F.col("dst")))
        .distinct(),
        fingerprint=_fp(edges_fp, "vertices"),
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
        fingerprint=_fp(edges_fp, f"pagerank-{pr_iters}-{pr_damping}"),
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
