"""North-rule launch mode: `spark-submit --py-files dedup.zip` end-to-end.

The north rule requires the job to run "via spark-submit --py-files on a
multi-executor cluster". This test proves the packaging works with NOTHING
but the zip: the CLI script is copied outside the repo, PYTHONPATH is
stripped, and the driver + executors resolve every `dedup.*` import through
the --py-files archive alone (zipimport also feeds the worker-daemon preload
path, which get_spark wires via PYTHONPATH derived from the package
location). BENCH/STANDALONE.md covers the multi-executor axis with the same
job; this covers the submission surface itself.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    for root in ("/opt/spark", os.path.dirname(__import__("pyspark").__file__)):
        p = os.path.join(root, "bin", "spark-submit")
        if os.path.exists(p):
            return p
    return None


def test_spark_submit_py_files_end_to_end(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")

    zip_path = tmp_path / "dedup.zip"
    pkg = os.path.join(REPO, "dedup")
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in sorted(os.listdir(pkg)):
            if f.endswith(".py"):
                z.write(os.path.join(pkg, f), arcname=f"dedup/{f}")

    from dedup.fixtures import make_corpus

    pdf, truth = make_corpus(n_base=40, seed=11)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pdf.to_parquet(corpus / "part-0.parquet", index=False)

    # the CLI script runs from OUTSIDE the repo: its own directory carries no
    # dedup package, so the imports must come from --py-files
    cli_copy = tmp_path / "run_cli.py"
    shutil.copyfile(os.path.join(pkg, "cli.py"), cli_copy)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out_dir = tmp_path / "warehouse"
    res = subprocess.run(
        [
            submit,
            "--py-files", str(zip_path),
            str(cli_copy),
            "--input", str(corpus),
            "--output", str(out_dir),
            "--master", "local[2]",
            # reliable-materialization mode: every multi-consumer
            # intermediate checkpoints durably under this dir
            "--checkpoint-dir", str(tmp_path / "rdd_ckpt"),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("docs=")]
    assert line, res.stdout[-2000:]
    docs = int(line[0].split()[0].split("=")[1])
    clusters = int(line[0].split()[1].split("=")[1])
    assert docs == len(pdf)
    # planted dup groups guarantee strictly fewer clusters than docs
    assert 0 < clusters < docs
    # --checkpoint-dir activated reliable materialization: durable RDD
    # checkpoint files must exist under the configured dir
    ckpt = tmp_path / "rdd_ckpt"
    files = [f for r, _, fs in os.walk(ckpt) for f in fs]
    assert files, "no reliable-checkpoint files under --checkpoint-dir"
