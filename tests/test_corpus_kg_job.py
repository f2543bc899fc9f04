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
                  "canonical_triples", "type_signatures"):
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
