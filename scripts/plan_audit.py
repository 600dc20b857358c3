"""Physical-plan audit → PLANS.md.

Captures ``explain("formatted")`` for EVERY catalog query plus the crawl
engine's performance-critical dataflows, and asserts the physical properties
the 100 TB design depends on:

* universal bans on every catalog query — no ``BatchEvalPython`` (row-at-
  a-time Python), no ``CartesianProduct``, no unpartitioned window (a global
  single-partition ``Window.orderBy`` is the 10^10-row scale killer) — with
  per-query declared exceptions where a property is intentional (listed with
  justification in ``EXCEPTIONS``);
* per-query required properties (``WANTS``): parquet scans show
  PushedFilters / pruned ReadSchema, small-side joins broadcast, windows
  partitioned;
* the corpus dedup/hash tier contains NO Python plan node of any kind
  (``ArrowEval``/``MapInPandas`` additionally banned — pure JVM HOFs);
* the crawl fetch join broadcasts the popped batch over the bucket-pruned
  pages scan, the pop dataflow has no unpartitioned window, and the exact
  dedup tier's ``url_seen`` scan partition-prunes to candidate buckets.

Run: python scripts/plan_audit.py  (writes PLANS.md at repo root)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from twitter_crawler_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# an unpartitioned windowspecdefinition starts directly with a sort-ordered
# expression instead of a partition list
UNPARTITIONED_WINDOW = r"windowspecdefinition\([^,)]+ (ASC|DESC)"
UNIVERSAL_BANS = ["BatchEvalPython", "CartesianProduct", UNPARTITIONED_WINDOW]

# per-query REQUIRED physical properties
WANTS: dict[str, list[str]] = {
    "tpch_q1": ["PushedFilters"],
    "tpch_q3": ["BroadcastHashJoin"],
    "host_budget_rank": ["BroadcastHashJoin", "Window"],
    "url_features": ["Window"],
    "anti_join_new": ["LeftAnti", "Broadcast"],
    "ts_range_join": ["PushedFilters"],
    # the tiny benchmark gram set must broadcast into the corpus-side explode
    "decontaminate": ["BroadcastHashJoin"],
    # packing's running sum must be a (shard-)partitioned window
    "sequence_pack": ["Window"],
    # the trigram "model" tables are alphabet-bounded → must broadcast
    "lm_perplexity": ["BroadcastHashJoin"],
}

# the corpus hashing/dedup tier must be pure JVM — ban every Python node
_JVM_ONLY = ["Python", "Arrow"]
JVM_ONLY_QUERIES = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "dedup_embedding_nn", "simhash_signatures",
    "doc_fingerprint", "lang_id", "quality_score", "token_count",
    "token_edges", "multimodal_meta", "ann_lsh_bucketed",
    "repetition_stats", "decontaminate", "sequence_pack",
    "lm_perplexity", "lsh_bucket_stats", "span_dedup", "bm25_topk",
]

# universal-ban exceptions, each with its reason (rendered into PLANS.md)
EXCEPTIONS: dict[str, dict[str, str]] = {
    "ann_bruteforce_topk": {
        "CartesianProduct": "by design: the exact-recall baseline scores every"
        " (query, corpus) pair — the scale path is ann_lsh_bucketed, which is"
        " audited with the ban",
    },
}


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from twitter_crawler_spark.config import CrawlConfig

    spark = get_spark(cores=8, shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()
    # (name, plan, wants, bans, waived: {pattern: reason})
    sections: list[tuple[str, str, list[str], list[str], dict[str, str]]] = []

    # 1. every catalog query: universal bans + declared wants/extras
    for name in sorted(qs):
        plan = _fmt(qs[name](spark, SF))
        waived = EXCEPTIONS.get(name, {})
        bans = [b for b in UNIVERSAL_BANS if b not in waived]
        if name in JVM_ONLY_QUERIES:
            bans = bans + _JVM_ONLY
        sections.append((name, plan, WANTS.get(name, []), bans, waived))

    # 2. the fetch-join shape from the crawl engine (bucket pruning + broadcast)
    from twitter_crawler_spark.crawl.engine import CrawlEngine
    from twitter_crawler_spark.fixtures.webgen import generate_web

    fx = "/tmp/tcs_audit_fx"
    if not os.path.exists(os.path.join(fx, "meta.json")):
        generate_web(fx, seed=11, n_pages=500, n_hosts=10, n_seeds=5, span_rounds=3)
    import shutil

    shutil.rmtree("/tmp/tcs_audit_state", ignore_errors=True)
    eng = CrawlEngine(spark, fx, "/tmp/tcs_audit_state", CrawlConfig(max_rounds=1))
    eng.init_state()
    from pyspark.sql import functions as F

    frontier = eng._frontier_live(-1)
    popped = frontier.limit(5).select("url", "last_cursor")
    fetch = (
        eng._pages()
        .where(F.col("bucket").isin([0, 1, 2]))
        .join(F.broadcast(popped), "url")
        .where((F.col("ts_logical") <= 3600) & (F.col("ts_logical") > F.col("last_cursor")))
        .select("url", "ts_logical", "html")
    )
    sections.append(
        ("crawl_fetch_join", _fmt(fetch), ["BroadcastHashJoin", "PartitionFilters"], [], {})
    )

    # 3. the pop dataflow: every window MUST be partitioned. Audits the REAL
    # engine methods, with dummy offsets standing in for the per-round
    # collected counts.
    hosts_df = eng.store.read_state(spark, "hosts", -1)
    pop_flow = eng._attach_seq(
        eng._pop_ranged(eng._pop_survivors(frontier, hosts_df, 3600, 1)),
        {0: 0},
    )
    sections.append(
        ("crawl_pop_seq", _fmt(pop_flow), ["Window"], [UNPARTITIONED_WINDOW], {})
    )

    # 4. the exact dedup tier: the url_seen scan must partition-prune to the
    # candidate slice's buckets (bucket is a partition column of the layout,
    # so the IN-list must surface as a PartitionFilters entry, not a
    # post-scan Filter). Audits the REAL engine method over the real layout.
    need_exact = (
        frontier.select(F.col("url").alias("dst"))
        .withColumn("parent_depth", F.lit(0))
        .limit(7)
    )
    exact_plan = _fmt(eng._exact_new(need_exact, -1, [0, 3]))
    sections.append(
        (
            "crawl_seen_exact_tier",
            exact_plan,
            [r"PartitionFilters: \[[^\]]*bucket", "LeftAnti"],
            [],
            {},
        )
    )

    # 5. the merge-on-read frontier due scan: the banded base (and any ins
    # log) must partition-prune to due bands — the band filter has to reach
    # the parquet scan as a PartitionFilters entry, so a round never reads
    # future-scheduled frontier rows (the 10^10-row full-scan killer)
    due_plan = _fmt(eng._frontier_live(-1, due_band=0))
    sections.append(
        (
            "crawl_frontier_due_scan",
            due_plan,
            [r"PartitionFilters: \[[^\]]*band"],
            [UNPARTITIONED_WINDOW],
            {},
        )
    )

    # 6. the merge-on-read hosts live view: resolved from the base + the
    # O(batch) hosts_touch/hosts_new sidecar logs — no full-table groupBy
    # (the last-writer-wins fold is a join against the aggregated TOUCH log,
    # which is tiny), no window at all. Run one real round first so the
    # sidecar logs exist and the audited plan is the merged shape.
    eng.run(max_rounds=1)
    hosts_plan = _fmt(eng._hosts_live(eng.store.committed_round()))
    sections.append(
        (
            "crawl_hosts_live",
            hosts_plan,
            [r"hosts_touch", r"hosts_new"],
            [UNPARTITIONED_WINDOW, "CartesianProduct"],
            {},
        )
    )

    out = ["# PLANS — physical-plan audit (generated by scripts/plan_audit.py)",
           "",
           "Each section lists the physical properties the 100 TB design requires",
           "(`required:` line) and whether the captured plan exhibits them.",
           f"Universal bans on all {len(qs)} catalog queries: no BatchEvalPython,",
           "no CartesianProduct, no unpartitioned window (waivable per query,",
           "with the justification printed in the section).", ""]
    failures = []
    for name, plan, wants, bans, waived in sections:
        status = []
        for w in wants:
            ok = re.search(w, plan) is not None
            status.append(f"{w}={'OK' if ok else 'MISSING'}")
            if not ok:
                failures.append((name, w))
        for b in bans:
            bad = re.search(b, plan) is not None
            status.append(f"no-{b}={'VIOLATED' if bad else 'OK'}")
            if bad:
                failures.append((name, f"banned:{b}"))
        out.append(f"## {name}\n\nrequired: {', '.join(status)}\n")
        for pat, reason in waived.items():
            out.append(f"waived `{pat}`: {reason}\n")
        out.append("```\n" + plan.strip()[:4000] + "\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"audited {len(sections)} plans ({len(qs)} catalog queries + 5 engine flows)")
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
