"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed via Arrow-batched ``mapInPandas``.

This environment ships no image/audio codecs, so the actual decode is
STUBBED: :func:`decode_image` raises ``NotImplementedError`` unless a
deterministic fake decoder is requested. Everything around it — the binary
column schema, the batch iteration shape, the output feature schema, the
partition-preserving plumbing — is real and tested; swapping the stub for
PIL/ffmpeg is a one-function change.

At 100 TB the design holds because payload bytes never leave the executor:
``mapInPandas`` streams Arrow batches, features are computed per batch, and
only the (small) feature rows are shuffled.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, intensity_e6 long,"
    " frame_count int"
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an (H, W) uint8 array.

    No codec libraries exist in this container; with ``fake=True`` a
    deterministic pseudo-decode derives pixels from the payload bytes (for
    tests/benchmarks); otherwise this raises, marking the integration point.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "or plug a real decoder here"
        )
    h = 8 + payload[0] % 8 if payload else 8
    w = 8 + (payload[1] if len(payload) > 1 else 0) % 8
    # deterministic pixels: repeat payload bytes to fill the frame
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        return np.zeros((h, w), np.uint8)
    reps = int(np.ceil(h * w / len(buf)))
    return np.tile(buf, reps)[: h * w].reshape(h, w)


def intensity_e6(img: np.ndarray) -> int:
    """Mean pixel intensity scaled by 10^6, floored — EXACT integer
    arithmetic, so the Spark (Python) value and the SQL oracle value are
    bit-identical (a float mean + round() would diverge between Python's
    banker's rounding and SQL ROUND's half-up on ties)."""
    if img.size == 0:
        return 0
    return int(img.sum(dtype=np.int64)) * 1_000_000 // int(img.size)


def _features_batch(it, fake: bool = True):
    for pdf in it:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload) if payload is not None else b""
            img = decode_image(payload, fake=fake)
            rows.append(
                (
                    int(doc_id),
                    len(payload),
                    img.shape[1],
                    img.shape[0],
                    intensity_e6(img),
                    1,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_bytes", "width", "height", "intensity_e6", "frame_count",
            ],
        )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction pipeline over ``documents`` (text
    bytes stand in for image bytes — the testdata has no binary column; the
    plumbing is payload-agnostic). The implementation is mapInPandas (binary
    decode can't be SQL), but because the fake decode is deterministic byte
    arithmetic its features ARE SQL-expressible — ops.corpus.
    sql_multimodal_features is the dual-dialect twin that gives the driver a
    DuckDB oracle for this query (the SQL twin assumes 1-byte characters,
    which the ASCII testdata satisfies; the Spark op itself is byte-general)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_features_batch, FEATURE_SCHEMA).orderBy("doc_id")


def features_reference(doc_id: int, text: str) -> tuple:
    """Scalar twin for tests."""
    payload = text.encode("utf-8")
    img = decode_image(payload, fake=True)
    return (
        doc_id,
        len(payload),
        img.shape[1],
        img.shape[0],
        intensity_e6(img),
        1,
    )
