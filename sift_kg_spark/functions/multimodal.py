"""Multimodal payload plumbing: opaque binary columns + typed metadata.

A 100 TB training-data pipeline treats images/audio/video as opaque
``binary`` columns travelling next to typed metadata, with decode /
feature-extraction as Arrow-batched UDFs over ``mapInPandas``. The Spark
side of that — schema, batch iteration, partition-preserving shape, magic-
byte sniffing — is real and tested here; the codec step itself is stubbed
(this environment ships no image/audio libraries): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake feature vector (seeded from the payload bytes) so the
downstream plumbing (embedding columns, ANN over them) can be exercised
end-to-end.
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
