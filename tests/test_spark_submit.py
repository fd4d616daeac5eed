"""North-rule launch-mode gate: the DAG runs via spark-submit --py-files.

The rule's literal launch contract ("launched with spark-submit --py-files")
is exercised for real: the package is zipped, the subprocess runs from an
EMPTY working directory (so `import stackoverflowner_spark` can only
resolve from the --py-files zip shipped to the executors/driver), and the
pipeline must produce triples.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _build_zip(path: str) -> str:
    pkg = os.path.join(REPO, "stackoverflowner_spark")
    zpath = os.path.join(path, "stackoverflowner_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_pipeline_runs_via_spark_submit_py_files(tmp_path):
    zpath = _build_zip(str(tmp_path))
    workdir = str(tmp_path / "emptycwd")
    os.makedirs(workdir)
    out = str(tmp_path / "kg_out")
    script = os.path.join(REPO, "run_pipeline.py")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["SPARK_GRAFT_CPUS"] = "4"
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zpath,
         script, "--synth", "300", "--out", out, "--mode", "fused",
         "--tagger", "gazetteer"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    # the pipeline prints a one-line JSON summary; triples must exist
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary.get("triples", 0) > 0
    assert os.path.exists(out)
