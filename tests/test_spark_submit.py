"""North-rule submission shape: spark-submit --py-files of the zipped
package, end to end. Also guards the zip-import regression this test
found (a namespace `resources` dir breaks importlib.resources inside a
--py-files zip — resources/__init__.py keeps it a regular package)."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_crawl(corpus_dir, tmp_path):
    zpath = tmp_path / "pkg.zip"
    pkgdir = os.path.join(REPO, "spacetime_crawler4_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkgdir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            str(zpath),
            os.path.join(REPO, "tools", "submit_crawl.py"),
            "--pages",
            f"{corpus_dir}/pages.parquet",
            "--robots",
            f"{corpus_dir}/robots.parquet",
            "--seeds",
            f"{corpus_dir}/seeds.parquet",
            "--state",
            str(tmp_path / "state"),
            "--max-waves",
            "2",
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    stats = json.loads(last)
    assert stats["frontier_urls"] > 0
    assert stats["waves"] == 2
