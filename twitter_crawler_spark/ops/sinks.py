"""Flat-file sinks (SURVEY.md §2.1 S8/S9/S11).

The reference dumps tweets/urls/edges as TSV rows with ``<a|b|c>``-encoded
lists (storages/StreamStorage.scala:18-38, GraphStorage.scala:396-408,
Main.scala:53-55). Spark-native form: ``df.write.csv(sep='\\t')`` with
``concat_ws('|')`` list encoding and the ``<NoEntities>`` empty marker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NO_ENTITIES = "<NoEntities>"  # StreamStorage.scala:35 empty-list marker


def encode_list(col: Column) -> Column:
    """``<a|b|c>`` list encoding with the reference's empty marker
    (StreamStorage.scala:33-38)."""
    return F.when(F.size(col) == 0, F.lit(NO_ENTITIES)).otherwise(
        F.concat(F.lit("<"), F.array_join(col, "|"), F.lit(">"))
    )


def write_tsv(df: DataFrame, path: str, coalesce: int | None = 1) -> None:
    """TSV sink. ``coalesce=1`` mirrors the reference's single flat file for
    small dumps; pass ``None`` to keep full write parallelism at scale."""
    if coalesce:
        df = df.coalesce(coalesce)
    df.write.mode("overwrite").option("sep", "\t").option("header", "false").csv(path)


def edge_dump(edges: DataFrame) -> DataFrame:
    """Edge TSV projection — (src, dst, ts) like the scan-all-relationships
    dump (GraphStorage.scala:396-408), deterministically ordered."""
    return edges.select("src_url", "dst_url", "ts").orderBy(
        "src_url", "dst_url", "ts"
    )
