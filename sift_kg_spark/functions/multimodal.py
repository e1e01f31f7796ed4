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

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Optional-import codec seam: when a real image codec (PIL) or video
# demuxer (PyAV) is installed, ``fake=False`` uses it; otherwise
# ``fake=False`` keeps raising NotImplementedError (the honest stub this
# sandbox ships, which has neither library). The fake path is unchanged
# either way — deterministic plumbing tests never depend on the codecs.
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover
    _PILImage = None
    HAS_PIL = False

try:  # pragma: no cover - environment-dependent
    import av as _av

    HAS_AV = True
except ImportError:  # pragma: no cover
    _av = None
    HAS_AV = False

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


def _image_to_feature(img) -> np.ndarray:
    """Grayscale 4x4 thumbnail -> FEATURE_DIM float vector in [0, 1].

    Deterministic for a given decoded image (PIL's nearest-neighbor
    reduce has no randomness), so the real path keeps the same
    same-bytes-in -> same-vector-out contract as the fake path.
    """
    side = int(FEATURE_DIM**0.5)
    small = img.convert("L").resize((side, side), _PILImage.NEAREST)
    return (
        np.asarray(small, dtype=np.float32).reshape(FEATURE_DIM) / 255.0
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a FEATURE_DIM float vector.

    With ``fake=False`` the real codec path runs when PIL is installed
    (optional import at module load); without PIL it raises — the honest
    stub for codec-free environments. With ``fake=True`` a deterministic
    feature vector is derived from the payload bytes (stable across
    runs/processes), so schema, batching, and downstream ANN plumbing are
    fully exercised with no codec at all.
    """
    if not fake:
        if HAS_PIL:
            with _PILImage.open(io.BytesIO(bytes(payload))) as img:
                return _image_to_feature(img)
        raise NotImplementedError(
            "image decode requires a codec library (PIL/opencv); "
            "run with fake=True for deterministic plumbing tests"
        )
    return _fake_feature(payload)


# Per-byte-value hash lookup table for the fake feature path.
# pd.util.hash_array over an integer array is a pure elementwise uint64
# mix (the hash key only applies to object/string dtypes), so hashing a
# byte array elementwise equals gathering from this 256-entry table —
# pinned by test_multimodal against the original per-payload hash call.
_BYTE_HASH_LUT = pd.util.hash_array(np.arange(256, dtype=np.uint64))


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic fake feature: identical output to the original
    ``hash_array(payload bytes).sum()``-seeded draw, with the per-byte
    hash replaced by a table gather (one numpy gather+sum per payload
    instead of a hash_array call over up-to-4096 uint64 casts)."""
    b = bytes(payload[:4096]).ljust(8, b"\0")
    h = _BYTE_HASH_LUT[np.frombuffer(b, dtype=np.uint8)]
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

    With ``fake=False`` and PIL installed, the image is re-encoded as
    PNG with its dimensions halved until the encoding fits ``max_bytes``
    (deterministic; an already-fitting payload is returned unchanged).
    Without PIL, ``fake=False`` raises. With ``fake=True`` the payload is
    stride-sampled down to ``max_bytes`` deterministically (same bytes in
    → same bytes out, output never larger than input), so the
    batching/schema/size-accounting plumbing is real while the codec
    seam stays honest.
    """
    if not fake:
        if HAS_PIL:
            raw = bytes(payload)
            if len(raw) <= max_bytes:
                return raw
            with _PILImage.open(io.BytesIO(raw)) as img:
                im = img.convert("RGB")
                while True:
                    buf = io.BytesIO()
                    im.save(buf, format="PNG")
                    out = buf.getvalue()
                    if len(out) <= max_bytes or min(im.size) <= 1:
                        return out
                    im = im.resize(
                        (max(1, im.width // 2), max(1, im.height // 2)),
                        _PILImage.NEAREST,
                    )
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

    With ``fake=False`` and PyAV installed, the container is demuxed,
    ``n_frames`` evenly spaced frames are decoded, and each is
    featurized with the same 4x4-grayscale reducer as ``decode_image``
    (PIL also required for the reducer). Without the codecs,
    ``fake=False`` raises. With ``fake=True`` the payload is treated as
    one fake frame per ``_FAKE_BYTES_PER_FRAME`` bytes; each sampled
    frame's feature vector is derived deterministically from (its byte
    slice, its index) — so short payloads yield fewer frames, sampling
    is evenly spaced over the fake duration, and the exploded schema/ANN
    plumbing downstream is fully exercised.
    """
    if not fake:
        if HAS_AV and HAS_PIL:
            with _av.open(io.BytesIO(bytes(payload))) as container:
                frames = [
                    f.to_image() for f in container.decode(video=0)
                ]
            total = len(frames)
            if total == 0:
                return []
            take = min(n_frames, total)
            return [
                _image_to_feature(frames[(j * total) // take])
                for j in range(take)
            ]
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
        # same LUT-gather equivalence as _fake_feature (pinned by test)
        h = _BYTE_HASH_LUT[np.frombuffer(sl.ljust(8, b"\0"), dtype=np.uint8)]
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
