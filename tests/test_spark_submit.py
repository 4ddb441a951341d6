"""North-rule deployment shape: a REAL spark-submit --py-files run.

The reference ships a shell-started asyncio loop
(brave_parallel_processing.py:327-396); the engine's production analog is
spark-submit with the package zipped onto --py-files. This test runs the
actual binary against local-cluster[2,2,...] (two separate executor JVMs)
from a scratch cwd, so the engine is importable ONLY from the zip — proving
the deployment unit is complete (a missing module would crash an executor
Python worker, not just the driver).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit binary")
def test_spark_submit_pyfiles_crawl(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "bwc_pyfiles.zip"))
    # the job script is copied OUT of the repo: its imports must resolve via
    # --py-files alone (spark-submit puts the script's own dir on sys.path,
    # which here is the scratch dir, not the checkout)
    script = shutil.copy(os.path.join(REPO, "tools", "submit_crawl.py"), tmp_path)

    # seeds parquet written by a tiny plain-pyarrow step (no Spark session in
    # the test process — the submitted job owns the only session)
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, REPO)
    from bravewebcrawler_spark.sources.synthweb import SynthWeb

    web = SynthWeb(seed=7, n_hosts=30, pages_per_host=15, hot_hosts=3)
    rows = web.seed_urls(12)
    seeds_path = str(tmp_path / "seeds.parquet")
    pq.write_table(
        pa.table({"seed_id": [r[0] for r in rows], "url": [r[1] for r in rows]}), seeds_path
    )

    state_dir = str(tmp_path / "state")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing from the checkout leaks to workers
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.executor.memory=1500m",
            "--conf", "spark.driver.memory=2g",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            script,
            "--seeds", seeds_path,
            "--state-dir", state_dir,
            "--rounds", "2",
            "--max-urls-per-round", "60",
            "--politeness", "4",
            "--bloom-buckets", "8",
            "--web-hosts", "30",
            "--web-pages-per-host", "15",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    line = [l for l in out.stdout.splitlines() if l.startswith('{"submit_ok"')][-1]
    res = json.loads(line)
    assert res["submit_ok"] and res["total_dequeued"] > 0
    assert res["master"].startswith("local-cluster")
    # both rounds committed atomically
    manifests = [f for f in os.listdir(state_dir) if f.startswith("_MANIFEST")]
    assert len(manifests) == res["last_round"] + 1
