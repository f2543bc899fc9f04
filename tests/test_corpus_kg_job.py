"""End-to-end corpus→KG job (jobs/run_corpus_kg.py): one subprocess
run over synth pages, then invariants over every stage output — the
mining + refinement layers composing in the spark-submit shape."""

import json
import os
import subprocess
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def job(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus_kg"))
    p = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "run_corpus_kg.py"),
            "--synth-pages", "600", "--out", out, "--cpus", "4",
            "--verbs", "can,are", "--preps", "found,in,the",
        ],
        capture_output=True, text=True, timeout=560,
        env={**os.environ, "PYTHONPATH": ROOT},
    )
    assert p.returncode == 0, p.stderr[-3000:]
    counts = json.loads(p.stdout.strip().splitlines()[-1])
    return out, counts


def _q(out, sql):
    return duckdb.connect().execute(sql.format(out=out)).df()


def test_stage_counts_and_artifacts(job):
    out, counts = job
    for stage in ("isa", "openie", "corroborated", "confidence",
                  "taxonomy", "temporal", "vertices", "edges",
                  "canonical_triples", "type_signatures",
                  "functionality", "violations", "completions",
                  "rules", "inferences",
                  "eval_ranks", "eval_metrics", "negatives"):
        assert os.path.isdir(os.path.join(out, stage)), stage
    for stage in ("pages", "isa", "openie", "corroborated",
                  "confidence", "temporal", "vertices", "edges"):
        assert counts[stage] > 0, (stage, counts)


def test_mined_triples_are_real(job):
    out, _ = job
    openie = _q(out, "SELECT * FROM '{out}/openie/*.parquet'")
    got = {(r.subj, r.pred, r.obj) for r in openie.itertuples()}
    assert ("bird", "can", "fly") in got  # "bird can fly in sky"
    isa = _q(out, "SELECT * FROM '{out}/isa/*.parquet'")
    assert "place" in set(isa["hyper"])   # "the gym is a place ..."


def test_confidence_invariants(job):
    out, counts = job
    conf = _q(out, "SELECT * FROM '{out}/confidence/*.parquet'")
    assert len(conf) == counts["corroborated"]  # one row per fact
    assert conf["confidence"].max() == 1.0
    assert (conf["confidence"] > 0).all()
    assert (conf["confidence"] <= 1.0).all()


def test_temporal_windows_are_ordered(job):
    out, _ = job
    t = _q(out, "SELECT * FROM '{out}/temporal/*.parquet'")
    assert (t["first_seen"] <= t["last_seen"]).all()
    assert (t["n_moments"] <= t["n_obs"]).all()


def test_graph_edges_reference_vertices(job):
    out, _ = job
    n = _q(out, """
      SELECT COUNT(*) AS n FROM '{out}/edges/*.parquet' e
      WHERE e.src_id NOT IN (SELECT ent_id FROM '{out}/vertices/*.parquet')
         OR e.dst_id NOT IN (SELECT ent_id FROM '{out}/vertices/*.parquet')
    """)["n"][0]
    assert n == 0


def test_functional_audit_invariants(job):
    out, _ = job
    fn = _q(out, "SELECT * FROM '{out}/functionality/*.parquet'")
    assert (fn["functionality"] >= 0).all()
    assert (fn["functionality"] <= 1).all()
    assert (fn["avg_objs"] >= 1).all()
    v = _q(out, "SELECT * FROM '{out}/violations/*.parquet'")
    if len(v):
        assert (v["n_objs"] >= 2).all()
        assert (v["top_support"] <= v["total_support"]).all()


def test_completions_are_new_scored_edges(job):
    out, _ = job
    c = _q(out, "SELECT * FROM '{out}/completions/*.parquet'")
    if len(c):
        assert (c["score"] > 0).all()
        # predictions never duplicate a known isa edge
        dup = _q(out, """
          SELECT COUNT(*) AS n FROM '{out}/completions/*.parquet' c
          JOIN '{out}/edges/*.parquet' e
            ON e.src = c.src AND e.dst = c.dst AND e.rel = 'isa'
        """)["n"][0]
        assert dup == 0


def test_negatives_are_filtered(job):
    out, counts = job
    assert counts["negatives"] > 0
    bad = _q(out, """
      SELECT COUNT(*) AS n FROM '{out}/negatives/*.parquet' g
      JOIN '{out}/edges/*.parquet' e
        ON e.src = g.subj AND e.rel = g.pred AND e.dst = g.neg_obj
    """)["n"][0]
    assert bad == 0
    same = _q(out, """
      SELECT COUNT(*) AS n FROM '{out}/negatives/*.parquet'
      WHERE neg_obj = obj
    """)["n"][0]
    assert same == 0


def test_eval_metrics_invariants(job):
    out, counts = job
    ranks = _q(out, "SELECT * FROM '{out}/eval_ranks/*.parquet'")
    # one rank row per held-out triple
    assert len(ranks) == counts["eval_ranks"]
    scored = ranks[ranks["rank"].notna()]
    if len(scored):
        assert (scored["rank"] >= 1).all()
    m = _q(out, "SELECT * FROM '{out}/eval_metrics/*.parquet'")
    assert len(m) == 1
    assert m["n"][0] == len(ranks)
    if m["n"][0] > 0:
        for col in ("mrr", "hits_1", "hits_3", "hits_10"):
            assert 0.0 <= m[col][0] <= 1.0
        assert m["hits_1"][0] <= m["hits_3"][0] <= m["hits_10"][0]


def test_rule_mining_invariants(job):
    out, counts = job
    r = _q(out, "SELECT * FROM '{out}/rules/*.parquet'")
    if len(r):
        # AMIE metric algebra: support bounded by both denominators,
        # PCA denominator bounded by the body count, so standard
        # confidence can never exceed PCA confidence
        assert (r["support"] <= r["n_body"]).all()
        assert (r["support"] <= r["head_size"]).all()
        assert (r["support"] <= r["pca_body"]).all()
        assert (r["pca_body"] <= r["n_body"]).all()
        assert (r["confidence"] <= r["pca_confidence"] + 1e-12).all()
    # inferred conclusions never duplicate a known edge, and every
    # confidence came from a surviving (>= min_pca) rule
    inf = _q(out, "SELECT * FROM '{out}/inferences/*.parquet'")
    if len(inf):
        assert (inf["confidence"] >= 0.5).all()
        assert (inf["n_rules"] >= 1).all()
        dup = _q(out, """
          SELECT COUNT(*) AS n FROM '{out}/inferences/*.parquet' i
          JOIN '{out}/edges/*.parquet' e
            ON e.src = i.src AND e.rel = i.rel AND e.dst = i.dst
        """)["n"][0]
        assert dup == 0


def test_embeddings_and_energies(job):
    out, counts = job
    emb = _q(out, "SELECT * FROM '{out}/kg_emb/*.parquet'")
    assert counts["kg_emb"] > 0
    # one embedding row per vertex + per prefixed predicate, all dim-16
    assert (emb["emb"].apply(len) == 16).all()
    verts = _q(out, "SELECT * FROM '{out}/vertices/*.parquet'")
    ids = set(emb["id"])
    assert set(verts["ent"]) <= ids
    en = _q(out, "SELECT * FROM '{out}/triple_energies/*.parquet'")
    assert counts["triple_energies"] > 0
    assert (en["dist"] >= 0).all()
    import numpy as np
    assert np.isfinite(en["dist"]).all()
    # every scored triple's pred is an embedded id
    assert set(en["pred"]) <= ids
