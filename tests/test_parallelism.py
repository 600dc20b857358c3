"""Parallelism-independence gate: every golden output must be identical at
any core count / shuffle parallelism. This is the property that makes the
engine's determinism claims survive a real cluster (where task counts and
scheduling differ run to run): pop ordering, seen-set arbitration, OPIC
accounting and doc extraction may not depend on how work is partitioned.

Spark pins the master per JVM, so each core count runs in its own
subprocess; the parent compares full-state fingerprints (crawl log order,
url_seen, edges, docs-with-sha256), not just counters.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from twitter_crawler_spark.fixtures.webgen import generate_web

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUNDS = 4

_CHILD = """
import hashlib, json, sys
from twitter_crawler_spark.config import CrawlConfig
from twitter_crawler_spark.crawl.engine import CrawlEngine
from twitter_crawler_spark.session import get_spark

fx, state, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(cores=cores, shuffle_partitions=cores)
eng = CrawlEngine(spark, fx, state, CrawlConfig(max_rounds=%(rounds)d))
eng.run()

def h(items):
    m = hashlib.sha256()
    for x in sorted(items):
        m.update(repr(x).encode())
    return m.hexdigest()

fp = {
    "crawl_log": h((r.round, r.seq, r.url, r.attempt)
                   for r in eng.crawl_log().collect()),
    "url_seen": h(r.url for r in eng.url_seen().collect()),
    "edges": h((r.src_url, r.dst_url, r.round) for r in eng.edges().collect()),
    "docs": h((r.url, r.round, r.text_sha256) for r in eng.docs().collect()),
    "n_seen": eng.url_seen().count(),
}
print("FP=" + json.dumps(fp, sort_keys=True))
""" % {"rounds": ROUNDS}


def _run(fx: str, state: str, cores: int) -> dict:
    env = {**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_DRIVER_MEM": "4g"}
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, fx, state, str(cores)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("FP=")][-1]
    return json.loads(line[3:])


def test_goldens_identical_across_core_counts(tmp_path):
    fx = str(tmp_path / "fx")
    generate_web(fx, seed=23, n_pages=300, n_hosts=10, n_seeds=6, span_rounds=3)
    lo = _run(fx, str(tmp_path / "state2"), cores=2)
    hi = _run(fx, str(tmp_path / "state16"), cores=16)
    assert lo["n_seen"] > 0
    assert lo == hi, f"goldens diverge across parallelism:\n{lo}\nvs\n{hi}"
