"""Relation-definition dimension table (SURVEY.md §1.1, S1).

Tiny (tens-to-hundreds of rows) — always broadcast into joins. Can be
built from the embedded fixtures or loaded from a relation_info-style
JSON file (object keyed by relation name, values with init_prompts /
prompts / seed_ent_tuples — the reference's public input format).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.textops import get_n_ents

RELATION_SCHEMA = T.StructType(
    [
        T.StructField("rel", T.StringType(), False),
        T.StructField("init_prompts", T.ArrayType(T.StringType()), False),
        T.StructField("prompts", T.ArrayType(T.StringType()), False),
        T.StructField(
            "seed_ent_tuples", T.ArrayType(T.ArrayType(T.StringType())), False
        ),
        T.StructField("n_ents", T.IntegerType(), False),
    ]
)


def relations_from_records(spark: SparkSession, records: list[dict]) -> DataFrame:
    rows = [
        (
            r["rel"],
            list(r["init_prompts"]),
            list(r.get("prompts", [])),
            [list(t) for t in r["seed_ent_tuples"]],
            get_n_ents(r["init_prompts"][0]),
        )
        for r in records
    ]
    # tiny dim table (tens-to-hundreds of rows): one partition, always
    # broadcast downstream — avoids fanning every derived branch into
    # defaultParallelism near-empty partitions. localCheckpoint cuts
    # the Python-parallelize lineage: downstream plans branch over this
    # table many times (pos/neg pairs, per-arity negatives, join-backs)
    # and would otherwise round-trip the driver rows through a Python
    # worker once per branch per action (~1-2s each, measured)
    return (
        spark.createDataFrame(rows, RELATION_SCHEMA)
        .coalesce(1)
        .localCheckpoint(eager=True)
    )


def relations_from_json(spark: SparkSession, path: str) -> DataFrame:
    """Load a relation_info-style file: {rel: {init_prompts, prompts,
    seed_ent_tuples}} (reference ``main.py:25``)."""
    with open(path) as f:
        obj = json.load(f)
    records = [
        {
            "rel": rel,
            "init_prompts": info["init_prompts"],
            "prompts": info.get("prompts", []),
            "seed_ent_tuples": info["seed_ent_tuples"],
        }
        for rel, info in obj.items()
    ]
    return relations_from_records(spark, records)


def fixture_relations(spark: SparkSession) -> DataFrame:
    from .fixtures import FIXTURE_RELATIONS

    return relations_from_records(spark, FIXTURE_RELATIONS)


def candidate_prompts(relations: DataFrame, use_init_prompts: bool) -> DataFrame:
    """(rel, prompt) rows: init prompts (+ searched prompts unless
    use_init_prompts), deduped on the RAW string before style fixing —
    matching reference ``main.py:49-50`` (python ``set`` on raw
    strings) + ``knowledge_harvester.py:39-42`` (validity filter, then
    fix_prompt_style). Dedup happens pre-fix, so two raw prompts that
    normalize identically both survive, as in the reference."""
    pool = F.col("init_prompts") if use_init_prompts else F.array_union(
        "init_prompts", "prompts"
    )
    out = (
        relations.select("rel", "n_ents", F.explode(pool).alias("raw_prompt"))
        .dropDuplicates(["rel", "raw_prompt"])
    )
    # F1 validity: any '<ENT' at position i>0 must be preceded by space or '"'
    valid = ~F.col("raw_prompt").rlike('[^ "]<ENT')
    # F2 fix_prompt_style as a column expression (data_utils.py:68-73)
    stripped = F.expr("btrim(raw_prompt, ' .')")
    first = F.substring(stripped, 1, 1)
    fixed = F.concat(
        F.when(first.rlike("[A-Za-z]"), F.upper(first)).otherwise(first),
        F.substring(stripped, 2, 10_000),
        F.lit(" ."),
    )
    return out.filter(valid).select(
        "rel", "n_ents", fixed.alias("prompt")
    )
