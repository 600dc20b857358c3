"""Deployment-contract gate: the BASELINE.json north rule requires the whole
job to run via ``spark-submit --py-files``. This test exercises that exact
path end-to-end — package the library with scripts/make_dist.sh, launch
jobs/crawl.py through the real spark-submit binary on a tiny fixture, and
assert the emitted counters equal the pure-Python oracle's (the same golden
gate the in-process engine passes)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from twitter_crawler_spark.config import CrawlConfig
from twitter_crawler_spark.fixtures.webgen import generate_web
from twitter_crawler_spark.oracle.frontier_oracle import FrontierOracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUNDS = 3


def _spark_submit() -> str:
    for cand in (
        shutil.which("spark-submit"),
        os.path.join(os.path.dirname(sys.executable), "spark-submit"),
    ):
        if cand and os.path.exists(cand):
            return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit binary on PATH or in the pyspark install")


def test_spark_submit_dist_golden(tmp_path):
    subprocess.run(["sh", os.path.join(REPO, "scripts", "make_dist.sh")],
                   check=True, capture_output=True, cwd=REPO)
    dist = os.path.join(REPO, "dist", "twitter_crawler_spark.zip")
    assert os.path.exists(dist)

    fx = str(tmp_path / "fx")
    generate_web(fx, seed=19, n_pages=300, n_hosts=10, n_seeds=6, span_rounds=3)
    state = str(tmp_path / "state")

    env = {**os.environ, "SPARK_GRAFT_DRIVER_MEM": "4g",
           "SPARK_GRAFT_CPUS": "4"}
    # drop the repo from PYTHONPATH so ONLY the shipped zip provides the
    # package — a packaging gap (missing module) fails here, not on a cluster
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [_spark_submit(), "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", dist,
         os.path.join(REPO, "jobs", "crawl.py"),
         "--fixture", fx, "--state", state, "--max-rounds", str(ROUNDS)],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])

    o = FrontierOracle(fx, CrawlConfig(max_rounds=ROUNDS)).run()
    om = {k: sum(m[k] for m in o.metrics) for k in ("fetched", "new_urls", "dupes")}
    assert summary["fetched"] == om["fetched"]
    assert summary["new_urls"] == om["new_urls"]
    assert summary["dupes"] == om["dupes"]
    assert summary["final_round"] == ROUNDS - 1
