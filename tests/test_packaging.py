"""Deployment-shape proof: the package imports from a zip exactly as
`spark-submit --py-files kg_spark.zip` ships it (north rule). Pure
python throughout, so zipimport must work with no filesystem
extraction."""

import os
import subprocess
import sys
import zipfile


def test_py_files_zip_import(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "kg_spark.zip")
    pkg = os.path.join(root, "knowledge_harvest_from_lms_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    code = (
        "from knowledge_harvest_from_lms_spark.functions.paraphrase import recover_slots\n"
        "from knowledge_harvest_from_lms_spark.lm import build_stub_lm\n"
        "print(recover_slots('giraffe lives in africa', ['giraffe', 'africa']))\n"
        "print(len(build_stub_lm().pll_mask_logprobs("
        "'<ENT0> is located in <ENT1> .', ['paris', 'france'])))\n"
    )
    env = {**os.environ, "PYTHONPATH": zpath}
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, cwd=str(tmp_path), timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "<ENT0> lives in <ENT1>" in out.stdout
    assert "\n2" in out.stdout
