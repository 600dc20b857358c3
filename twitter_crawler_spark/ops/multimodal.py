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


_FEATURE_COLS = ["doc_id", "n_bytes", "width", "height", "intensity_e6", "frame_count"]


def _fake_features_vectorized(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-batch numpy path for the fake decoder: the pseudo-decode is pure
    byte arithmetic (h = 8 + b0%8, w = 8 + b1%8, pixels = payload tiled to
    h*w), so one concatenated buffer + prefix sums computes every row's
    tiled pixel sum with zero per-row Python — reduceat/cumsum instead of
    the per-item zip loop a real codec would need."""
    payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
    n = np.fromiter((len(p) for p in payloads), np.int64, len(payloads))
    buf = np.frombuffer(b"".join(payloads), np.uint8).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(n)))[:-1]
    csum = np.concatenate(([0], np.cumsum(buf)))
    total = csum[starts + n] - csum[starts]
    safe0 = np.minimum(starts, max(len(buf) - 1, 0))
    b0 = np.where(n >= 1, buf[safe0] if len(buf) else 0, 0)
    b1 = np.where(n >= 2, buf[np.minimum(safe0 + 1, max(len(buf) - 1, 0))] if len(buf) else 0, 0)
    h = 8 + np.where(n >= 1, b0 % 8, 0)
    w = 8 + np.where(n >= 2, b1 % 8, 0)
    hw = h * w
    n_safe = np.maximum(n, 1)
    rem = hw % n_safe
    rem_sum = csum[starts + rem] - csum[starts]
    pix_sum = (hw // n_safe) * total + rem_sum
    intensity = np.where(n > 0, pix_sum * 1_000_000 // hw, 0)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64").to_numpy(),
            "n_bytes": n.astype(np.int32),
            "width": w.astype(np.int32),
            "height": h.astype(np.int32),
            "intensity_e6": intensity.astype(np.int64),
            "frame_count": np.ones(len(n), np.int32),
        }
    )


def _features_batch(it, fake: bool = True):
    for pdf in it:
        if not len(pdf):
            continue
        if fake:
            yield _fake_features_vectorized(pdf)
            continue
        # real-codec shape: decoders are inherently per-item — this loop is
        # the documented integration point for PIL/ffmpeg
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload) if payload is not None else b""
            img = decode_image(payload, fake=fake)
            rows.append(
                (int(doc_id), len(payload), img.shape[1], img.shape[0],
                 intensity_e6(img), 1)
            )
        yield pd.DataFrame(rows, columns=_FEATURE_COLS)


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
