"""P1 — pseudo-log-likelihood scoring as an Arrow-batched mapInPandas
UDF (SURVEY.md §2.10).

Packages the reference's per-(prompt, tuple) scoring
(reference ``models/knowledge_harvester.py:119-134`` +
``models/language_model_wrapper.py:37-117``) behind a per-executor LM
singleton. The UDF is the ONLY Python crossing in the scoring path;
everything around it (joins that build pairs, the means/softmax after)
stays JVM-side.

Dedup-before-expensive-UDF is a standing pattern (SURVEY.md §4): use
``score_distinct_pairs`` to score each distinct (rel, prompt, ents)
once, then join scores back to the (possibly duplicated) pair table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def ents_key_col(col="ents"):
    return F.concat_ws(SEP, col)


def make_pll_score_fn(lm_name: str, seed: int,
                      max_tokens_per_forward: int | None = None):
    """Returns an iterator-of-pandas fn adding a ``score`` column to
    batches with columns (prompt, ents, ...).

    ``max_tokens_per_forward`` caps the padded-forward packing budget
    (default: the backend's own). Size it by logits memory, not just
    compute: a forward over B packed rows of length L materializes a
    [B, L, vocab] logits block per python worker — at vocab 30k and
    the 16384-token default that is fine for a torch float32 backend,
    but the float64 numpy backend wants ~2-4k here."""

    def fn(batches):
        from ..functions.scoring import combine_mask_logprobs
        from ..lm import resolve_lm

        lm = resolve_lm(lm_name, seed)
        kw = {}
        if max_tokens_per_forward is not None:
            kw["max_tokens_per_forward"] = max_tokens_per_forward
        for pdf in batches:
            pairs = [
                (prompt, list(ents))
                for prompt, ents in zip(pdf["prompt"].tolist(), pdf["ents"].tolist())
            ]
            all_lps = lm.pll_mask_logprobs_batch(pairs, **kw)
            scores = [
                combine_mask_logprobs(lps, n_ents=len(ents))
                for lps, (_, ents) in zip(all_lps, pairs)
            ]
            pdf = pdf.assign(score=scores)
            yield pdf

    return fn


def score_pairs(pairs: DataFrame, lm_name: str = "stub", seed: int = 42,
                max_tokens_per_forward: int | None = None) -> DataFrame:
    """Adds ``score double`` to a DataFrame with (prompt, ents) cols."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(pairs.schema.fields) + [T.StructField("score", T.DoubleType())]
    )
    return pairs.mapInPandas(
        make_pll_score_fn(lm_name, seed, max_tokens_per_forward),
        schema=out_schema,
    )


def score_distinct_pairs(
    pairs: DataFrame, lm_name: str = "stub", seed: int = 42
) -> DataFrame:
    """Scores each distinct (rel, prompt, ents) once and joins the
    score back — duplicate pairs keep their multiplicity for the
    downstream means (reference averages include duplicates,
    ``models/knowledge_harvester.py:45-67``)."""
    keyed = pairs.withColumn("_ek", ents_key_col())
    # r6: pin the scoring stage's width to defaultParallelism. The
    # former cols-only repartition let AQE coalesce by BYTES — a few MB
    # of prompt text is one partition — which serialized the CPU-bound
    # LM scoring onto a single Python worker (measured: the ekar50
    # prompt-weight phase ran ~4 s single-core). Scoring is per-row
    # deterministic, so partitioning does not affect values
    # (test_harvest_pipeline pins identical output across
    # shuffle_partitions settings).
    n_parts = pairs.sparkSession.sparkContext.defaultParallelism
    distinct = (
        keyed.select("rel", "prompt", "_ek", "ents")
        .dropDuplicates(["rel", "prompt", "_ek"])
        .repartition(n_parts, "rel", "prompt", "_ek")
    )
    scored = score_pairs(distinct, lm_name, seed).select(
        "rel", "prompt", "_ek", "score"
    )
    return keyed.join(scored, ["rel", "prompt", "_ek"]).drop("_ek")
