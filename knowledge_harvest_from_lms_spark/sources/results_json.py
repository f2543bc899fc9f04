"""Reference-format JSON result export (C10 / the JSON side of S3-S4,
S7 — VERDICT r1 missing items 2-3).

The reference persists, per relation (reference ``main.py:36-61``):

    results/{rel_set}/{setting}/{model_name}/{rel}/prompts.json
        [[prompt, weight], ...]          (weight-desc)
    results/{rel_set}/{setting}/{model_name}/{rel}/ent_tuples.json
        [[[ent, ...], weight], ...]      (weight-desc)

with ``setting = f'{max_n_ent_tuples}tuples' + ('_initprompts' |
f'_top{max_n_prompts}prompts')``. It also writes searched prompts back
into ``relation_info/{rel_set}.json`` (reference
``search_prompts.py:128-129``).

These artifacts are inherently driver-side small (≤ max_n_prompts
prompts and ≤ max_n_ent_tuples tuples per relation), so a bounded
per-relation collect is the correct scale design — the parquet
catalog (sources/catalog.py) remains the big-data sink; this exporter
exists so a reference user can diff outputs file-for-file and so
``plans/evaluation.py`` can round-trip P/R against either engine's
results.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def result_setting(max_n_ent_tuples: int, max_n_prompts: int, use_init_prompts: bool) -> str:
    """The reference's results subdir name (``main.py:31-35``)."""
    setting = f"{max_n_ent_tuples}tuples"
    if use_init_prompts:
        return setting + "_initprompts"
    return setting + f"_top{max_n_prompts}prompts"


def write_reference_results(
    prompt_weights: DataFrame,
    triples: DataFrame,
    base_dir: str,
    rel_set: str,
    model_name: str,
    max_n_ent_tuples: int = 1000,
    max_n_prompts: int = 20,
    use_init_prompts: bool = False,
    summary: bool = True,
) -> str:
    """Write ``prompts.json`` + ``ent_tuples.json`` per relation in the
    reference's exact layout, plus ``summary.txt`` (the
    ``present_result.py`` artifact) unless ``summary=False``; returns
    the output dir (``results/{rel_set}/{setting}/{model_name}``).

    ``prompt_weights``: (rel, prompt, weight); ``triples``:
    (rel, ents, weight, rank) as produced by the harvest plan."""
    setting = result_setting(max_n_ent_tuples, max_n_prompts, use_init_prompts)
    out_dir = os.path.join(base_dir, "results", rel_set, setting, model_name)

    pw_rows = prompt_weights.select("rel", "prompt", "weight").orderBy(
        "rel", F.desc("weight"), "prompt"
    ).collect()
    tuple_rows = triples.select("rel", "ents", "weight", "rank").orderBy(
        "rel", "rank"
    ).collect()

    by_rel_prompts: dict[str, list] = {}
    for r in pw_rows:
        by_rel_prompts.setdefault(r["rel"], []).append([r["prompt"], float(r["weight"])])
    by_rel_tuples: dict[str, list] = {}
    for r in tuple_rows:
        by_rel_tuples.setdefault(r["rel"], []).append(
            [[str(e) for e in r["ents"]], float(r["weight"])]
        )

    for rel in sorted(set(by_rel_prompts) | set(by_rel_tuples)):
        rel_dir = os.path.join(out_dir, rel)
        os.makedirs(rel_dir, exist_ok=True)
        with open(os.path.join(rel_dir, "prompts.json"), "w") as f:
            json.dump(by_rel_prompts.get(rel, []), f, indent=4)
        with open(os.path.join(rel_dir, "ent_tuples.json"), "w") as f:
            json.dump(by_rel_tuples.get(rel, []), f, indent=4)

    if summary:
        _write_summary_txt(by_rel_prompts, by_rel_tuples, out_dir)
    return out_dir


def _write_summary_txt(
    by_rel_prompts: dict[str, list],
    by_rel_tuples: dict[str, list],
    out_dir: str,
    n_present: int = 20,
    pool: int = 200,
    seed: int = 42,
) -> str:
    """``summary.txt`` next to the per-relation JSONs — the reference's
    final artifact (``present_result.py:44-53``): per relation, the
    weighted prompts, the top-``n_present`` tuples and a random sample
    over the top-``pool``, separated by a ``=`` rule. Presentation-only
    divergences (documented): aligned plain-text columns instead of
    PrettyTable, and the sample is SEEDED (the engine's determinism
    contract; the reference uses bare ``random.sample``)."""
    import random

    lines: list[str] = []
    for rel in sorted(set(by_rel_prompts) | set(by_rel_tuples)):
        tuples = by_rel_tuples.get(rel, [])[:pool]
        if not tuples:
            continue  # reference skips relations with no outputs
        top = [str(t[0]) for t in tuples[:n_present]]
        rng = random.Random(f"{seed}|{rel}")
        sample = [str(t[0]) for t in rng.sample(tuples, min(n_present, len(tuples)))]
        lines.append(f"Relation: {rel}")
        lines.append("Prompts:")
        for prompt, weight in by_rel_prompts.get(rel, []):
            lines.append(f"- {weight:.4f} {prompt}")
        lines.append("Harvested Tuples:")
        hdr_l, hdr_r = f"Ours (Top {n_present})", f"Ours (Random samples over top {pool} tuples)"
        width = max([len(hdr_l)] + [len(t) for t in top]) + 2
        lines.append(f"{hdr_l:{width}s}| {hdr_r}")
        for i in range(max(len(top), len(sample))):
            left = top[i] if i < len(top) else "\\"
            right = sample[i] if i < len(sample) else "\\"
            lines.append(f"{left:{width}s}| {right}")
        lines.append("=" * 50)
    path = os.path.join(out_dir, "summary.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def write_relation_info_json(
    relations: DataFrame, path: str, searched_prompts: DataFrame | None = None
) -> None:
    """S7 JSON write-back: persist the relation table (optionally with
    newly searched prompts merged in) as ``relation_info/{rel_set}.json``
    in the reference's schema (reference ``search_prompts.py:110-129``:
    the searched prompts are saved into the SAME file the relation
    definitions came from)."""
    rows = relations.select(
        "rel", "init_prompts", "seed_ent_tuples", "prompts"
    ).orderBy("rel").collect()
    extra: dict[str, list[str]] = {}
    if searched_prompts is not None:
        for r in searched_prompts.select("rel", "prompt").orderBy("rel", "prompt").collect():
            extra.setdefault(r["rel"], []).append(r["prompt"])
    info = {}
    for r in rows:
        prompts = list(r["prompts"] or [])
        for p in extra.get(r["rel"], []):
            if p not in prompts:
                prompts.append(p)
        info[r["rel"]] = {
            "init_prompts": list(r["init_prompts"]),
            "seed_ent_tuples": [list(t) for t in r["seed_ent_tuples"]],
            "prompts": prompts,
        }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(info, f, indent=4)
