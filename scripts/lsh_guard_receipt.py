"""Receipt for the LSH hot-bucket guard (VERDICT r4 'What's wrong #1').

Injects a boilerplate duplicate cluster (N_BOILER near-identical docs — the
degenerate band-key case every real web corpus contains) into the sf0.01
documents table, then runs the MinHash-LSH candidate-pair query twice on the
SAME input: guarded (LSH_BUCKET_CAP) and unguarded (cap = 2^60). Records
output pair counts and walls for both, plus the lsh_bucket_stats report, to
LSH_GUARD.json.

The point: unguarded, the injected cluster alone contributes ~N²/2 pairs
through ONE (band, key) bucket per band — the skew blow-up the plan audit
cannot see; guarded, the same cluster contributes N−1 star edges and the
wall stays flat.

Usage: python scripts/lsh_guard_receipt.py [n_boiler]
"""

from __future__ import annotations

import json
import sys
import time

import pandas as pd

from twitter_crawler_spark.ops.corpus import (
    LSH_BUCKET_CAP,
    sql_dedup_minhash_lsh,
    sql_lsh_bucket_stats,
)
from twitter_crawler_spark.session import get_spark

SF = "/root/testdata/sf0.01"
N_BOILER = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
BOILER = (
    "cookie consent privacy policy terms of service all rights reserved "
    "navigation menu home about contact subscribe newsletter footer "
) * 3


def main() -> None:
    spark = get_spark("lsh-guard-receipt")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    base_max = int(docs.doc_id.max())
    boiler = pd.DataFrame(
        {
            "doc_id": [base_max + 1 + i for i in range(N_BOILER)],
            "source": "boilerplate",
            "lang": "en",
            # identical token set per doc (trailing id token is numeric and
            # distinct, keeping rows non-identical for exact dedup while the
            # MinHash token-set signature still collides — worst case for LSH)
            "text": [BOILER for _ in range(N_BOILER)],
        }
    )
    skewed = pd.concat(
        [docs[["doc_id", "source", "lang", "text"]], boiler], ignore_index=True
    )
    sdf = spark.createDataFrame(skewed)
    sdf.cache().count()
    sdf.createOrReplaceTempView("documents")

    # JVM/codegen warm-up outside the timed region, then interleaved
    # best-of-2 per variant (the same storm-resistant protocol bench.py uses)
    spark.sql(sql_dedup_minhash_lsh("spark", cap=LSH_BUCKET_CAP)).count()
    out: dict = {"n_base_docs": len(docs), "n_boiler": N_BOILER, "cap": LSH_BUCKET_CAP}
    variants = (("guarded", LSH_BUCKET_CAP), ("unguarded", 1 << 60))
    walls: dict[str, list[float]] = {label: [] for label, _ in variants}
    pairs: dict[str, int] = {}
    for _rep in range(2):
        for label, cap in variants:
            t0 = time.monotonic()
            pairs[label] = spark.sql(sql_dedup_minhash_lsh("spark", cap=cap)).count()
            walls[label].append(round(time.monotonic() - t0, 2))
    for label, _cap in variants:
        out[label] = {"pairs": pairs[label], "wall_s": min(walls[label]),
                      "walls_raw": walls[label]}
        print(f"{label:10s} pairs={pairs[label]} walls={walls[label]}", flush=True)

    stats = spark.sql(sql_lsh_bucket_stats("spark")).toPandas()
    out["bucket_stats"] = stats.to_dict("records")
    out["pairs_diverted"] = int(
        stats.pairs_unguarded.sum() - stats.pairs_emitted.sum()
    )
    with open("LSH_GUARD.json", "w") as f:
        json.dump(out, f, indent=2, default=int)
    print(json.dumps({k: out[k] for k in ("guarded", "unguarded", "pairs_diverted")}))
    spark.stop()


if __name__ == "__main__":
    main()
