"""Multimodal payload plumbing: opaque binary columns + typed metadata.

A 100 TB training-data pipeline treats images/audio/video as opaque
``binary`` columns travelling next to typed metadata, with decode /
feature-extraction as Arrow-batched UDFs over ``mapInPandas``. The Spark
side of that — schema, batch iteration, partition-preserving shape, magic-
byte sniffing, byte-budget resize accounting, evenly-spaced frame
sampling with an exploded per-frame feature table — is real and tested
here; the codec steps themselves are stubbed (this environment ships no
image/audio libraries): ``decode_image`` / ``resize_image`` /
``sample_frames`` raise ``NotImplementedError`` unless ``fake=True``, in
which case they produce deterministic outputs (seeded from the payload
bytes) so the downstream plumbing (embedding columns, ANN over them) can
be exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (magic bytes, sniffed type) — deterministic, library-free
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav-or-avi"),
    (b"ID3", "audio/mp3"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"<html", "text/html"),
    (b"<!DOC", "text/html"),
]

METADATA_SCHEMA = "url string, media_type string, n_bytes int"
FEATURE_SCHEMA = "url string, media_type string, n_bytes int, feature array<float>"

FEATURE_DIM = 16


def sniff_type(payload: bytes | None) -> str:
    if payload is None:
        return "empty"
    head = bytes(payload[:16])
    for magic, typ in _MAGIC:
        if head.startswith(magic) or head.lower().startswith(magic.lower()):
            return typ
    return "application/octet-stream"


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a FEATURE_DIM float vector.

    STUB: real decoding needs an image codec library that is not available
    in this environment. With ``fake=True`` a deterministic feature vector
    is derived from the payload bytes (stable across runs/processes), so
    schema, batching, and downstream ANN plumbing are fully exercised.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/opencv); "
            "run with fake=True for deterministic plumbing tests"
        )
    h = pd.util.hash_array(
        np.frombuffer(bytes(payload[:4096]).ljust(8, b"\0"), dtype=np.uint8).astype(
            np.uint64
        )
    )
    rng = np.random.default_rng(int(h.sum() % (2**63)))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


RESIZE_SCHEMA = (
    "url string, media_type string, n_bytes_in int, n_bytes_out int,"
    " resized binary"
)
FRAME_SCHEMA = "url string, frame_idx int, frame_feature array<float>"

# fake-codec frame cadence: one "frame" per this many payload bytes
_FAKE_BYTES_PER_FRAME = 1024


def resize_image(
    payload: bytes, max_bytes: int = 4096, fake: bool = False
) -> bytes:
    """Re-encode an image payload under a byte budget.

    STUB: real resizing needs an image codec. With ``fake=True`` the
    payload is stride-sampled down to ``max_bytes`` deterministically
    (same bytes in → same bytes out, output never larger than input), so
    the batching/schema/size-accounting plumbing is real while the codec
    seam stays honest.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires a codec library (PIL/opencv); "
            "run with fake=True for deterministic plumbing tests"
        )
    raw = bytes(payload)
    if len(raw) <= max_bytes:
        return raw
    stride = -(-len(raw) // max_bytes)  # ceil division
    return raw[::stride]


def sample_frames(
    payload: bytes, n_frames: int = 4, fake: bool = False
) -> list[np.ndarray]:
    """Sample ``n_frames`` evenly spaced frames from a video payload and
    featurize each to a FEATURE_DIM vector.

    STUB: real frame extraction needs a video codec. With ``fake=True``
    the payload is treated as one fake frame per ``_FAKE_BYTES_PER_FRAME``
    bytes; each sampled frame's feature vector is derived
    deterministically from (its byte slice, its index) — so short
    payloads yield fewer frames, sampling is evenly spaced over the
    fake duration, and the exploded schema/ANN plumbing downstream is
    fully exercised.
    """
    if not fake:
        raise NotImplementedError(
            "video frame sampling requires a codec library (ffmpeg); "
            "run with fake=True for deterministic plumbing tests"
        )
    raw = bytes(payload)
    total = max(1, len(raw) // _FAKE_BYTES_PER_FRAME)
    take = min(n_frames, total)
    out = []
    for j in range(take):
        idx = (j * total) // take
        sl = raw[
            idx * _FAKE_BYTES_PER_FRAME : (idx + 1) * _FAKE_BYTES_PER_FRAME
        ]
        h = pd.util.hash_array(
            np.frombuffer(sl.ljust(8, b"\0"), dtype=np.uint8).astype(np.uint64)
        )
        rng = np.random.default_rng((int(h.sum()) + idx) % (2**63))
        out.append(rng.standard_normal(FEATURE_DIM).astype(np.float32))
    return out


def resize_payloads(
    pages: DataFrame,
    payload_col: str = "html",
    max_bytes: int = 4096,
    fake: bool = True,
) -> DataFrame:
    """(url, media_type, n_bytes_in, n_bytes_out, resized) via mapInPandas
    — the batch-shaped resize stage (swap resize_image internals for a
    real codec on a real cluster; nothing else changes)."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                None if b is None else resize_image(b, max_bytes, fake=fake)
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf[payload_col].map(sniff_type),
                    "n_bytes_in": pdf[payload_col]
                    .map(lambda b: 0 if b is None else len(b))
                    .astype("int32"),
                    "n_bytes_out": pd.Series(
                        [0 if r is None else len(r) for r in resized],
                        dtype="int32",
                    ),
                    "resized": resized,
                }
            )

    return pages.select("url", payload_col).mapInPandas(
        _op, schema=RESIZE_SCHEMA
    )


def sample_video_frames(
    pages: DataFrame,
    payload_col: str = "html",
    n_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """(url, frame_idx, frame_feature) — one row per sampled frame via
    mapInPandas; null payloads produce no rows. The exploded frame table
    feeds the same embedding/ANN machinery as document features."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, feats = [], [], []
            for url, b in zip(pdf["url"], pdf[payload_col]):
                if b is None:
                    continue
                for j, v in enumerate(sample_frames(b, n_frames, fake=fake)):
                    urls.append(url)
                    idxs.append(j)
                    feats.append(v)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_feature": pd.Series(feats, dtype="object"),
                }
            )

    return pages.select("url", payload_col).mapInPandas(
        _op, schema=FRAME_SCHEMA
    )


def extract_metadata(pages: DataFrame, payload_col: str = "html") -> DataFrame:
    """(url, media_type, n_bytes) via mapInPandas over the binary column."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf[payload_col].map(sniff_type),
                    "n_bytes": pdf[payload_col]
                    .map(lambda b: 0 if b is None else len(b))
                    .astype("int32"),
                }
            )

    return pages.select("url", payload_col).mapInPandas(_op, schema=METADATA_SCHEMA)


def extract_features(
    pages: DataFrame, payload_col: str = "html", fake: bool = True
) -> DataFrame:
    """(url, media_type, n_bytes, feature) — decode+featurize per batch.

    ``fake=True`` (the only mode runnable here) produces deterministic
    vectors; swap ``decode_image`` internals for a real codec on a real
    cluster and nothing else changes.
    """

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if b is None else decode_image(b, fake=fake)
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf[payload_col].map(sniff_type),
                    "n_bytes": pdf[payload_col]
                    .map(lambda b: 0 if b is None else len(b))
                    .astype("int32"),
                    "feature": feats,
                }
            )

    return pages.select("url", payload_col).mapInPandas(_op, schema=FEATURE_SCHEMA)


def cosine_topk(
    features: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k neighbors of each query vector, JVM-side
    (zip_with dot product inside whole-stage codegen; the scale path is an
    LSH/IVF bucketing of the same feature column — see operators/lsh.py
    for the banding machinery it would reuse)."""
    from pyspark.sql import Window

    dot = F.expr(
        "aggregate(zip_with(q_feature, feature, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nq = F.expr(
        "sqrt(aggregate(q_feature, cast(0.0 as double), (acc, v) -> acc + v * v))"
    )
    nn = F.expr(
        "sqrt(aggregate(feature, cast(0.0 as double), (acc, v) -> acc + v * v))"
    )
    qd = queries.select(
        F.col("url").alias("query_url"), F.col("feature").alias("q_feature")
    )
    scored = (
        qd.crossJoin(features.select("url", "feature"))
        .filter(F.col("url") != F.col("query_url"))
        .withColumn("cosine", dot / (nq * nn))
    )
    w = Window.partitionBy("query_url").orderBy(F.desc("cosine"), F.asc("url"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_url", "url", "cosine", "rnk")
    )
