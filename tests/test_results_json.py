"""Reference-format JSON export round trips (VERDICT r1 item 4):
export → reload through plans/evaluation loaders → P/R == 1.0, plus a
parse of the reference's REAL published artifacts (results/human/...,
997 ranked tuples) through the same machinery."""

import json
import os

from knowledge_harvest_from_lms_spark.plans.evaluation import (
    load_golden_ent_tuples,
    precision_recall_at_k,
)
from knowledge_harvest_from_lms_spark.sources.relations import (
    fixture_relations,
    relations_from_json,
)
from knowledge_harvest_from_lms_spark.sources.results_json import (
    result_setting,
    write_reference_results,
    write_relation_info_json,
)

REF_RESULTS = (
    "/root/reference/results/human/1000tuples_top20prompts/roberta-large"
)


def _synth_outputs(spark):
    pw = spark.createDataFrame(
        [
            ("AtLocation", "<ENT0> is located in <ENT1> .", 0.6),
            ("AtLocation", "You find <ENT0> in <ENT1> .", 0.4),
            ("CapableOf", "<ENT0> can <ENT1> .", 1.0),
        ],
        "rel string, prompt string, weight double",
    )
    triples = spark.createDataFrame(
        [
            ("AtLocation", ["giraffe", "africa"], 0.5, 1),
            ("AtLocation", ["book", "library"], 0.3, 2),
            ("CapableOf", ["knife", "cut"], 0.9, 1),
        ],
        "rel string, ents array<string>, weight double, rank int",
    )
    return pw, triples


def test_export_layout_and_round_trip(spark, tmp_path):
    pw, triples = _synth_outputs(spark)
    out_dir = write_reference_results(
        pw, triples, str(tmp_path), rel_set="fixture", model_name="stub",
        max_n_ent_tuples=10, max_n_prompts=5,
    )
    assert out_dir.endswith(
        os.path.join("results", "fixture", "10tuples_top5prompts", "stub")
    )
    # exact reference file layout + shapes (reference main.py:36-61)
    with open(os.path.join(out_dir, "AtLocation", "prompts.json")) as f:
        prompts = json.load(f)
    assert prompts == [
        ["<ENT0> is located in <ENT1> .", 0.6],
        ["You find <ENT0> in <ENT1> .", 0.4],
    ]
    with open(os.path.join(out_dir, "AtLocation", "ent_tuples.json")) as f:
        tuples = json.load(f)
    assert tuples == [[["giraffe", "africa"], 0.5], [["book", "library"], 0.3]]

    golden = load_golden_ent_tuples(spark, out_dir, ["AtLocation", "CapableOf"])
    pr = precision_recall_at_k(triples, golden, k=100).collect()
    assert pr and all(r.precision == 1.0 and r.recall == 1.0 for r in pr)


def test_result_setting_names():
    assert result_setting(1000, 20, False) == "1000tuples_top20prompts"
    assert result_setting(1000, 20, True) == "1000tuples_initprompts"
    assert result_setting(500, 1, False) == "500tuples_top1prompts"


def test_real_reference_artifacts_round_trip(spark, tmp_path):
    """Machinery-level P/R against the reference's PUBLISHED results:
    load the real ent_tuples.json (997 rows), re-export it through our
    writer, reload, and require P/R == 1.0 at k=1000. (HF content
    parity needs torch — deferred; this pins the formats.)"""
    rel = "can_but_not_good"
    golden = load_golden_ent_tuples(spark, REF_RESULTS, [rel])
    n = golden.count()
    assert n == 997

    with open(os.path.join(REF_RESULTS, rel, "prompts.json")) as f:
        ref_prompts = json.load(f)
    pw = spark.createDataFrame(
        [(rel, p, float(w)) for p, w in ref_prompts],
        "rel string, prompt string, weight double",
    )
    out_dir = write_reference_results(
        pw, golden, str(tmp_path), rel_set="human", model_name="roberta-large"
    )
    # byte-for-byte identical prompts.json after the round trip
    with open(os.path.join(out_dir, rel, "prompts.json")) as f:
        assert json.load(f) == ref_prompts
    reloaded = load_golden_ent_tuples(spark, out_dir, [rel])
    assert reloaded.count() == n
    pr = precision_recall_at_k(golden, reloaded, k=1000).collect()
    assert all(r.precision == 1.0 and r.recall == 1.0 for r in pr)


def test_relation_info_write_back(spark, tmp_path):
    """S7: relations (+ newly searched prompts) persist back to the
    relation_info JSON schema and reload identically."""
    rels = fixture_relations(spark)
    searched = spark.createDataFrame(
        [("AtLocation", "Somewhere like <ENT1> keeps <ENT0> .")],
        "rel string, prompt string",
    )
    path = str(tmp_path / "relation_info" / "fixture.json")
    write_relation_info_json(rels, path, searched_prompts=searched)
    back = relations_from_json(spark, path)
    orig = {r.rel: r for r in rels.collect()}
    got = {r.rel: r for r in back.collect()}
    assert set(orig) == set(got)
    for rel, r in got.items():
        assert list(r.init_prompts) == list(orig[rel].init_prompts)
        assert [list(t) for t in r.seed_ent_tuples] == [
            list(t) for t in orig[rel].seed_ent_tuples
        ]
    assert "Somewhere like <ENT1> keeps <ENT0> ." in got["AtLocation"].prompts


def test_summary_txt_written_with_every_relation(spark, tmp_path):
    """write_reference_results emits summary.txt (the reference's
    present_result.py artifact) next to the per-relation JSONs: every
    relation with tuples appears, with its weighted prompts and the
    top/sample table; the file is deterministic across runs."""
    pw, triples = _synth_outputs(spark)
    out_dir = write_reference_results(
        pw, triples, str(tmp_path), rel_set="fixture", model_name="stub"
    )
    path = os.path.join(out_dir, "summary.txt")
    assert os.path.exists(path)
    text = open(path).read()
    for rel in ("AtLocation", "CapableOf"):
        assert f"Relation: {rel}" in text
    assert "- 0.6000 <ENT0> is located in <ENT1> ." in text
    assert "Harvested Tuples:" in text
    assert "['giraffe', 'africa']" in text
    assert text.count("=" * 50) == 2

    out2 = write_reference_results(
        pw, triples, str(tmp_path / "again"), rel_set="fixture", model_name="stub"
    )
    assert open(os.path.join(out2, "summary.txt")).read() == text

    out3 = write_reference_results(
        pw, triples, str(tmp_path / "nosummary"), rel_set="fixture",
        model_name="stub", summary=False,
    )
    assert not os.path.exists(os.path.join(out3, "summary.txt"))
