"""Iceberg-style snapshot store on parquet.

The sandbox has no Iceberg runtime jar (no network), so this module provides
the same *semantics* on plain parquet + an atomically-replaced JSON manifest:

* every crawl round writes its outputs under ``<table>/r=<k>/`` directories;
* a round becomes visible ONLY when the manifest is atomically replaced
  (``os.replace``) with ``committed_round = k`` — the analog of an Iceberg
  snapshot commit (and of the reference's single-writer actor serialization,
  storages/GraphStorage.scala:236-253, where the commit is the serialization
  point);
* readers always filter partition ``r <= committed_round`` so half-written
  rounds are invisible — resume after a crash re-runs the uncommitted round
  from the last committed state with zero re-fetch of committed rounds;
* state tables (``frontier``, ``hosts``) are full rewrites per round (the
  MERGE analog); log tables (``url_seen``, ``edges``, ``docs``, ``crawl_log``,
  ``round_metrics``) are per-round appends.

On a real cluster this class is swapped for ``spark.table("cat.db.t")`` +
Iceberg ``MERGE INTO`` / snapshot IDs; the engine only touches this interface.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_TABLES = ("frontier", "hosts")
LOG_TABLES = ("url_seen", "edges", "docs", "crawl_log", "round_metrics", "evictions")


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- manifest ---------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def manifest(self) -> dict | None:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def committed_round(self) -> int | None:
        m = self.manifest()
        return None if m is None else m["committed_round"]

    def commit(self, round_: int, info: dict | None = None) -> None:
        """Atomic snapshot commit — the round's outputs become visible."""
        m = self.manifest() or {"history": []}
        m["committed_round"] = round_
        m["history"] = m.get("history", []) + [
            {"round": round_, **(info or {})}
        ]
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)

    # --- paths ---------------------------------------------------------------

    def round_dir(self, table: str, round_: int) -> str:
        return os.path.join(self.root, table, f"r={round_}")

    @property
    def bloom_root(self) -> str:
        return os.path.join(self.root, "bloom")

    def bloom_dir(self, round_: int) -> str:
        return os.path.join(self.bloom_root, f"r={round_}")

    def bloom_round_dirs(self, upto_round: int) -> list[str]:
        """Bloom round dirs with r <= upto_round, NEWEST FIRST — the per-bucket
        shard resolution order. Each round dir holds sidecars only for the
        buckets that round actually touched; a bucket's current filter is its
        newest shard ≤ the committed round (no copy-forward of untouched
        shards). Driver cost is one listdir of the root (O(#rounds)); the
        per-bucket file probe happens inside executor tasks."""
        root = self.bloom_root
        if not os.path.isdir(root):
            return []
        ks = sorted(
            (int(d.split("=", 1)[1]) for d in os.listdir(root) if d.startswith("r=")),
            reverse=True,
        )
        return [os.path.join(root, f"r={k}") for k in ks if k <= upto_round]

    # --- write -----------------------------------------------------------------

    def write_round(
        self,
        df: DataFrame,
        table: str,
        round_: int,
        partition_by: tuple[str, ...] | None = None,
    ) -> str:
        path = self.round_dir(table, round_)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return path

    # --- read --------------------------------------------------------------------

    def read_state(self, spark: SparkSession, table: str, round_: int) -> DataFrame:
        return spark.read.parquet(self.round_dir(table, round_))

    def read_log(
        self, spark: SparkSession, table: str, upto_round: int
    ) -> DataFrame | None:
        """Union of committed appends (partition column ``r`` from the layout)."""
        root = os.path.join(self.root, table)
        if not os.path.isdir(root) or not any(
            d.startswith("r=") for d in os.listdir(root)
        ):
            return None
        df = spark.read.option("basePath", root).parquet(root)
        return df.filter(F.col("r") <= upto_round).drop("r")

    # --- recovery ---------------------------------------------------------------

    def clean_uncommitted(self) -> list[str]:
        """Drop round directories newer than the committed round (crash debris).

        This is what makes resume idempotent: an interrupted round leaves
        orphan ``r=k`` dirs that the manifest never referenced.
        """
        committed = self.committed_round()
        removed = []
        for table in STATE_TABLES + LOG_TABLES + ("bloom",):
            troot = os.path.join(self.root, table)
            if not os.path.isdir(troot):
                continue
            for d in os.listdir(troot):
                if not d.startswith("r="):
                    continue
                k = int(d.split("=", 1)[1])
                if committed is None or k > committed:
                    shutil.rmtree(os.path.join(troot, d))
                    removed.append(f"{table}/{d}")
        return removed
