"""Offline prompt-search job (S10) — the counterpart of the
reference's ``search_prompts.py`` entry point.

Prompt search is a dev-time workload: tens of external-LLM calls per
relation, output is ≤10 short strings per relation. The loop is
inherently sequential WITHIN a relation (accepted prompts feed the
next round and gate dedup), so the honest scale design is: parallel
ACROSS relations, sequential within — here as a driver loop (the
per-relation work is API-bound, not compute-bound; a thread pool on
the driver saturates any paraphrase API long before Spark executors
would help).

The paraphraser is injected (``paraphrase_fn``); results merge back
into the relation table / relation_info JSON exactly like the
reference persists them (``search_prompts.py:110-129``)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.paraphrase import search_prompts
from ..functions.textops import fix_prompt_style


def search_prompts_for_relations(
    relations: DataFrame,
    paraphrase_fn: Callable[[str], str] | None = None,
    similarity_threshold: int = 75,
    only_missing: bool = True,
) -> DataFrame:
    """relations (rel, init_prompts, prompts, seed_ent_tuples, n_ents)
    → the same table with ``prompts`` filled by paraphrase search for
    every relation whose ``prompts`` is empty (reference
    ``search_prompts.py:113-121``: existing prompt sets are kept;
    init_prompts are style-fixed either way).

    ``paraphrase_fn=None`` resolves the production OpenAI-compatible
    adapter from the environment (``functions/paraphrase_client``) —
    raising a clear error when the environment hasn't opted in, so CI
    and offline runs can never silently hit the network."""
    if paraphrase_fn is None:
        from ..functions.paraphrase_client import paraphrase_fn_from_env

        paraphrase_fn = paraphrase_fn_from_env()
        if paraphrase_fn is None:
            raise ValueError(
                "no paraphrase_fn given and no PARAPHRASE_API_BASE / "
                "PARAPHRASE_API_KEY / OPENAI_API_KEY in the environment"
            )
    spark = relations.sparkSession
    rows = relations.collect()  # dim table: tens-to-hundreds of rows
    out = []
    for r in rows:
        init_prompts = [fix_prompt_style(p) for p in r["init_prompts"]]
        prompts = list(r["prompts"] or [])
        if not prompts or not only_missing:
            prompts = search_prompts(
                init_prompts,
                [list(t) for t in r["seed_ent_tuples"]],
                paraphrase_fn,
                similarity_threshold=similarity_threshold,
            )
        out.append((
            r["rel"], init_prompts, prompts,
            [list(t) for t in r["seed_ent_tuples"]], r["n_ents"],
        ))
    return spark.createDataFrame(out, relations.schema).coalesce(1)


def searched_prompts_table(relations_before: DataFrame, relations_after: DataFrame) -> DataFrame:
    """(rel, prompt) rows newly added by the search — the shape
    ``sources/results_json.write_relation_info_json`` merges back."""
    before = relations_before.select(
        "rel", F.explode_outer("prompts").alias("prompt")
    )
    after = relations_after.select("rel", F.explode("prompts").alias("prompt"))
    return after.join(before, ["rel", "prompt"], "left_anti")
