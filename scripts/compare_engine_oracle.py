"""Dev driver: run oracle + Spark engine on a fixture and diff all goldens."""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_crawler_spark import CrawlConfig
from twitter_crawler_spark.crawl.engine import CrawlEngine
from twitter_crawler_spark.oracle import FrontierOracle
from twitter_crawler_spark.session import get_spark


def compare(fx: str, state: str, rounds: int = 20, cores: int = 8, use_filters=True):
    cfg = CrawlConfig(max_rounds=rounds)
    t0 = time.time()
    ores = FrontierOracle(fx, cfg).run()
    t_oracle = time.time() - t0
    shutil.rmtree(state, ignore_errors=True)
    spark = get_spark(cores=cores, shuffle_partitions=8)
    eng = CrawlEngine(spark, fx, state, cfg, use_filters=use_filters)
    t0 = time.time()
    summary = eng.run()
    t_engine = time.time() - t0
    print(f"oracle {t_oracle:.1f}s | engine {t_engine:.1f}s | {summary}")

    ok = True
    # crawl order
    elog = [
        (r.round, r.seq, r.url, r.host, r.depth, r.score, r.attempt)
        for r in eng.crawl_log().orderBy("round", "seq").collect()
    ]
    olog = [
        (c["round"], c["seq"], c["url"], c["host"], c["depth"], c["score"], c["attempt"])
        for c in ores.crawl_order
    ]
    if elog != olog:
        ok = False
        print(f"CRAWL_ORDER MISMATCH: engine={len(elog)} oracle={len(olog)}")
        for a, b in zip(olog, elog):
            if a != b:
                print("  first diff:\n   oracle:", a, "\n   engine:", b)
                break
        so, se = set(olog), set(elog)
        print("  only-oracle:", list(so - se)[:3])
        print("  only-engine:", list(se - so)[:3])
    else:
        print(f"crawl_order OK ({len(elog)} pops)")

    eseen = {r.url for r in eng.url_seen().collect()}
    if eseen != ores.url_seen:
        ok = False
        print(f"URL_SEEN MISMATCH: engine={len(eseen)} oracle={len(ores.url_seen)}")
        print("  only-oracle:", list(ores.url_seen - eseen)[:5])
        print("  only-engine:", list(eseen - ores.url_seen)[:5])
    else:
        print(f"url_seen OK ({len(eseen)})")

    eedges = {(r.src_url, r.dst_url, r.round) for r in eng.edges().collect()}
    if eedges != ores.edges:
        ok = False
        print(f"EDGES MISMATCH: engine={len(eedges)} oracle={len(ores.edges)}")
        print("  only-oracle:", list(ores.edges - eedges)[:3])
        print("  only-engine:", list(eedges - ores.edges)[:3])
    else:
        print(f"edges OK ({len(eedges)})")

    edocs = {(r.url): (r.round, r.text_sha256) for r in eng.docs().collect()}
    osha = ores.text_sha()
    odocs = {u: (rd, osha[u]) for u, (rd, _) in ores.docs.items()}
    if edocs != odocs:
        ok = False
        print(f"DOCS MISMATCH: engine={len(edocs)} oracle={len(odocs)}")
        for u in list(set(odocs) | set(edocs))[:2000]:
            if odocs.get(u) != edocs.get(u):
                print("  diff:", u, "oracle:", odocs.get(u), "engine:", edocs.get(u))
                break
    else:
        print(f"docs OK ({len(edocs)})")

    eev = sorted(r.url for r in eng.evictions().collect())
    oev = sorted(ores.evictions)
    if eev != oev:
        ok = False
        print(f"EVICTIONS MISMATCH: engine={len(eev)} oracle={len(oev)}")
    else:
        print(f"evictions OK ({len(eev)})")
    print("RESULT:", "MATCH" if ok else "MISMATCH")
    return ok


if __name__ == "__main__":
    fx = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fx1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sys.exit(0 if compare(fx, "/tmp/state1", rounds) else 1)
