"""The cluster packaging path, for real: `spark-submit --py-files
engine.zip main.py ...` exactly as README/SURVEY document it.

Every other CLI test imports main.py in-process, which never proves the
package survives zipimport (north rule: "run via spark-submit
--py-files on a multi-executor cluster"). This one stages a directory
containing ONLY main.py + engine.zip, strips the repo from PYTHONPATH,
and drives generate -> apply -> re-apply (idempotent skip) -> status
through real spark-submit subprocesses — so the engine code on both the
driver and the Python workers can only come from the zip, the same way
a cluster ships it.

Kept cheap: tiny key count, local[2], 2g driver, one epoch; ~4 JVM
cold-starts total.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)


def _build_zip(dest: str) -> None:
    pkg = os.path.join(REPO, "data_migration_validation_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))


def _submit(stage: str, argv: list[str]) -> dict:
    """Run one spark-submit command; return the LAST stdout JSON line."""
    env = dict(os.environ)
    # the package must resolve from engine.zip alone: drop any PYTHONPATH
    # entry that could reach the repo checkout
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != REPO
    )
    env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "4"
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.driver.memory=2g",
            "--py-files", os.path.join(stage, "engine.zip"),
            os.path.join(stage, "main.py"),
            *argv,
        ],
        cwd=stage,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"spark-submit {argv[0]} failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON on stdout:\n{proc.stdout[-2000:]}"
    return json.loads(lines[-1])


def test_py_files_zip_lifecycle(tmp_path):
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    _build_zip(os.path.join(stage, "engine.zip"))
    shutil.copy(os.path.join(REPO, "main.py"), stage)
    # nothing else in the staging dir — zipimport is the only way in
    assert sorted(os.listdir(stage)) == ["engine.zip", "main.py"]

    log = str(tmp_path / "log")
    table = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    gen = _submit(
        stage,
        ["generate", "--out", log, "--keys", "60", "--max-versions", "3",
         "--seed", "7"],
    )
    assert gen["events"] > 0 and gen["epochs"] >= 1

    apply1 = _submit(
        stage, ["apply", "--log", log, "--table", table, "--checkpoint", ckpt]
    )
    assert apply1["command"] == "apply"
    assert 0 < apply1["final_rows"] <= 60

    # at-least-once upstream: a full re-run must skip every committed
    # epoch and leave the table identical — through the packaged path
    apply2 = _submit(
        stage, ["apply", "--log", log, "--table", table, "--checkpoint", ckpt]
    )
    assert apply2["final_rows"] == apply1["final_rows"]

    status = _submit(stage, ["status", "--table", table])
    snap = status["snapshot"]
    assert snap["epochs_applied"] == gen["epochs"]
    assert snap["table"]["key_col"] == "url"
    assert status["quarantined_events"] == 0
