"""Cross-process determinism under different PYTHONHASHSEED values:
executors are separate Python processes with randomized hashing, so
ANY dependence on builtin hash() ordering (set iteration, dict order
from hashed keys, id assignment) would silently break partition-count
invariance. Scores, token ids, and beam-facing tokenizer output must
be byte-identical across hash seeds (all hashing in the engine is
blake2b/xxhash64-based by design)."""

import json
import os
import subprocess
import sys

PROBE = r"""
import json
from knowledge_harvest_from_lms_spark.lm import resolve_lm

out = {}
for name in ("stub", "fake", "fake-bpe", "fake-wp"):
    lm = resolve_lm(name)
    probe = {}
    probe["vocab"] = lm.vocab_size
    probe["banned_head"] = [int(i) for i in lm.banned_ids[:20]]
    if name != "stub":
        enc = lm._tok.encode("The giraffe is located in Africa.")
        probe["enc"] = [int(i) for i in enc]
    probe["pll"] = lm.pll_mask_logprobs(
        "<ENT0> is located in <ENT1> .", ["giraffe", "africa"]
    )
    ml = lm.mask_logits(
        "the " + lm.mask_token + " is located in africa ."
    )
    probe["ml"] = [round(float(x), 12) for x in ml[0][:16]]
    out[name] = probe
print(json.dumps(out, sort_keys=True))
"""


def _run(seed: str) -> dict:
    env = dict(os.environ, PYTHONHASHSEED=seed)
    p = subprocess.run(
        [sys.executable, "-c", PROBE],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_scores_identical_across_hash_seeds():
    a = _run("0")
    b = _run("424242")
    assert a == b
