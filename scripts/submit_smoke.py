"""spark-submit --py-files deployment smoke (north_rule contract).

Packages ``tildener_spark`` into a zip, then launches a REAL
``spark-submit --py-files pkg.zip`` job that imports the engine from
the zip (cwd pointed away from the repo so the import can only come
from the shipped archive) and runs the KG pipeline end to end on a
small synthetic corpus.

Usage: python scripts/submit_smoke.py [n_docs]
Prints one JSON line {"ok": true, "triples": N, ...} on success.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import json, sys
from tildener_spark import get_spark
from tildener_spark.config import EngineConfig
from tildener_spark.datagen import corpus_df, gazetteer_df, split_gold
from tildener_spark.plans.pipeline import run_pipeline

spark = get_spark(app_name="submit-smoke", master="local[4]",
                  shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
pages, *_ = split_gold(corpus_df(spark, n_docs))
res = run_pipeline(spark, pages, gazetteer_df(spark), EngineConfig())
n = res.canonical_triples.count()
ents = res.entities.count()
print(json.dumps({"ok": n > 0 and ents > 0, "triples": n,
                  "entities": ents, "docs": n_docs}))
spark.stop()
"""


def build_zip(dest: str) -> str:
    pkg_zip = os.path.join(dest, "tildener_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as z:
        pkg_root = os.path.join(REPO, "tildener_spark")
        for root, _dirs, files in os.walk(pkg_root):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return pkg_zip


def main() -> None:
    n_docs = sys.argv[1] if len(sys.argv) > 1 else "20"
    work = tempfile.mkdtemp(prefix="tildener_submit_")
    try:
        pkg_zip = build_zip(work)
        job_path = os.path.join(work, "job.py")
        with open(job_path, "w") as f:
            f.write(JOB)
        spark_submit = shutil.which("spark-submit") or os.path.join(
            os.path.dirname(sys.executable), "spark-submit")
        env = {k: v for k, v in os.environ.items()}
        env.pop("PYTHONPATH", None)  # the zip must be the only source
        out = subprocess.run(
            [spark_submit, "--master", "local[4]",
             "--py-files", pkg_zip, job_path, n_docs],
            capture_output=True, text=True, cwd=work, env=env,
            timeout=600)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
            sys.exit(1)
        print(lines[-1])
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
