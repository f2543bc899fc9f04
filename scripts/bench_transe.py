#!/usr/bin/env python
"""TransE-training-step scaling evidence, in its own FRESH JVM per
level — the BENCH_pack.json artifact pattern.

Why it left bench_scaling's shared per-level JVM: the q122 workload
was added last in that level (after nine workloads' heap history and
resident Python pools), and the only full-suite runs available at
round-5 close executed on a co-tenanted host (single-core calib
0.75–1.4M sha256/s vs the 1.3–1.7M idle band, 16–29% cross-level
drift — both runs printed their own contamination warning). A
dedicated 10-minute window is far likelier to land on a healthy host
than a 50-minute suite. Writes BENCH_transe.json.

Workload (q122 machinery, operators/kg_embed.py): one full-batch
TransE subgradient step over N_PAIRS (pos, neg) pairs against
N_ENTS + N_RELS embeddings of dim EMB_DIM — 4 role equi-joins,
per-dimension JVM-HOF geometry, one posexplode into the fixed-point
(id, i) gradient aggregate (~64M rows). Embeddings + pairs are
pre-materialized parquet so the timed section is the training step.

Usage: python scripts/bench_transe.py            # both levels
       python scripts/bench_transe.py --worker 8 # one level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_PAIRS = 1_000_000
N_ENTS = 200_000
N_RELS = 8
EMB_DIM = 16
LEVELS = (2, 8)
RUNS = 3


def run_level(cpus: int) -> dict:
    from bench import calibrate_host
    from pyspark.sql import functions as F

    from knowledge_harvest_from_lms_spark.operators.kg_embed import (
        init_embeddings,
        transe_step,
    )
    from knowledge_harvest_from_lms_spark.session import get_session

    calib = calibrate_host()
    spark = get_session(
        cpus=cpus,
        shuffle_partitions=cpus,
        app_name=f"kg-transe-{cpus}",
        extra_conf={
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "8g",
        },
    )
    emb_path = f"/tmp/kg_bench_emb_{N_ENTS}_{EMB_DIM}"
    if not os.path.exists(emb_path + "/_SUCCESS"):
        ids = (
            spark.range(N_ENTS)
            .select(F.concat(F.lit("v"), F.col("id").cast("string")).alias("id"))
            .unionAll(
                spark.range(N_RELS)
                .select(F.concat(F.lit("r"), F.col("id").cast("string")).alias("id"))
            )
        )
        init_embeddings(ids, dim=EMB_DIM, seed=0).repartition(64).write.mode(
            "overwrite"
        ).parquet(emb_path)
    pairs_path = f"/tmp/kg_bench_embpairs_{N_PAIRS}_{N_ENTS}"
    if not os.path.exists(pairs_path + "/_SUCCESS"):
        (
            spark.range(N_PAIRS)
            .select(
                F.concat(
                    F.lit("v"),
                    F.pmod(F.xxhash64("id"), F.lit(N_ENTS)).cast("string"),
                ).alias("subj"),
                F.concat(
                    F.lit("r"),
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_RELS)).cast("string"),
                ).alias("pred"),
                F.concat(
                    F.lit("v"),
                    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(N_ENTS)).cast("string"),
                ).alias("obj"),
                F.concat(
                    F.lit("v"),
                    F.pmod(F.xxhash64("id", F.lit(3)), F.lit(N_ENTS)).cast("string"),
                ).alias("neg_obj"),
            )
            .repartition(64)
            .write.mode("overwrite").parquet(pairs_path)
        )
    emb = spark.read.parquet(emb_path)
    pairs = spark.read.parquet(pairs_path)

    def step_pass():
        transe_step(emb, pairs, lr=0.05, margin=1.0).write.format(
            "noop"
        ).mode("overwrite").save()

    step_pass()  # warm: codegen + JIT
    runs = []
    for _ in range(RUNS):
        t0 = time.time()
        step_pass()
        runs.append(round(time.time() - t0, 3))
    spark.stop()
    sec = min(runs)
    return {
        "cpus": cpus,
        "host_calib_sha256_per_sec": int(calib),
        "emb_pairs": N_PAIRS,
        "emb_sec": sec,
        "emb_runs": runs,
        "emb_pairs_per_sec": round(N_PAIRS / sec, 1),
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print("RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return

    from bench import calibrate_host, wait_for_idle

    def wait_for_healthy_host(min_calib: float = 1.25e6,
                              max_spread: float = 0.12,
                              timeout_s: float = 900.0) -> None:
        # same gate as bench_scaling/bench_pack: watch the single-core
        # yardstick, not loadavg (a hypervisor co-tenant is invisible
        # to loadavg but halves the yardstick)
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            vals = [calibrate_host() for _ in range(3)]
            spread = max(vals) / max(1.0, min(vals)) - 1.0
            if min(vals) >= min_calib and spread <= max_spread:
                return
            time.sleep(15)
        sys.stderr.write("WARNING: host never settled; efficiencies "
                         "provisional\n")

    results = {}
    for cpus in LEVELS:
        wait_for_idle(max_load=2.0, timeout_s=300.0)
        wait_for_healthy_host()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, timeout=3600, cwd=ROOT,
            env=dict(os.environ, OPENBLAS_NUM_THREADS="1",
                     OMP_NUM_THREADS="1", MKL_NUM_THREADS="1"),
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-2000:] + "\n")
            raise RuntimeError(f"level {cpus} produced no RESULT")
        results[str(cpus)] = json.loads(line[-1][len("RESULT "):])

    lo, hi = results[str(LEVELS[0])], results[str(LEVELS[1])]
    ratio = LEVELS[1] / LEVELS[0]
    eff = (hi["emb_pairs_per_sec"] / lo["emb_pairs_per_sec"]) / ratio
    out = {
        "levels": list(LEVELS),
        "efficiency": round(eff, 3),
        "results": results,
    }
    with open(os.path.join(ROOT, "BENCH_transe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
