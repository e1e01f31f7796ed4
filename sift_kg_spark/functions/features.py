"""The per-document signature feature UDF.

One Arrow-vectorized pass per batch computes everything downstream stages
need, so the (expensive) tokenize/hash work happens exactly once per doc:

  * ``shingles``  — sorted-unique k-gram shingle hashes, stored as the
                    low 32 bits (equality-only use; halves the exchange);
                    the exact-Jaccard verify stage intersects these.
  * ``minhash``   — num_perm MinHash values.
  * ``bands``     — LSH band keys (the candidate-generation exchange key).
  * ``simhash``   — 64-bit SimHash (fuzzy confirmation via Hamming).
  * ``simchunks`` — SimHash chunk keys (deterministic low-Hamming
                    candidate channel, pigeonhole guarantee).
  * ``n_tokens`` / ``n_shingles`` — metrics + Jaccard denominators.

Replaces the reference's embedding+SemHash fuzzy phase
(/root/reference/src/sift_kg/graph/prededup.py:120-139) and the LLM
candidate-judgment inputs (/root/reference/src/sift_kg/resolve/resolver.py:
338-429) with deterministic signatures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sift_kg_spark.config import DedupConfig
from sift_kg_spark.functions import hashing as H

FEATURE_SCHEMA = (
    "n_tokens int, n_shingles int, shingles array<int>, "
    "minhash array<bigint>, bands array<bigint>, simhash bigint, "
    "simchunks array<bigint>, keys array<bigint>"
)

# What the Spark-side UDF actually ships across the Arrow boundary:
# every Spark consumer (pipeline, incremental, entry queries) projects
# exactly f.n_tokens / f.shingles / f.simhash / f.keys — minhash, bands
# and simchunks exist only as intermediates inside the kernel (bands
# derive the packed keys; simchunks fold into keys). Transferring them
# anyway cost ~60% of the output bytes (the 128-lane minhash alone is
# 1 KB/doc) plus the per-doc list materialization. The full layout stays
# available via ``compute_features_pdf(slim=False)`` for the oracle and
# kernel tests.
SLIM_FEATURE_SCHEMA = (
    "n_tokens int, shingles array<int>, simhash bigint, keys array<bigint>"
)

# Persisted-feature format version, recorded in every stage-snapshot
# context. Bump whenever the on-disk feature encoding changes semantics
# (e.g. the int64 -> int32 shingle truncation): an incremental run must
# REJECT a base whose features were written under another format —
# otherwise Spark silently coerces the union (array<int> vs array<bigint>)
# and every cross-generation Jaccard computes near 0.
FEATURE_FORMAT = 2

# Columns (name -> Spark type) an incremental run requires of a base
# feature snapshot, exactly as the current format writes them.
FEATURE_BASE_DTYPES = {
    "shingles": "array<int>",
    "simhash": "bigint",
    "keys": "array<bigint>",
}

# channel tag in the low 2 bits of every packed blocking key
CHANNEL_MINHASH = 0
CHANNEL_SIMCHUNK = 1
CHANNEL_ANCHOR = 2
N_ANCHORS = 8

_ANCHOR_SEED = np.uint64(0xA5C0_11EC_7ED0_0001)


def compute_features_pdf(
    texts: pd.Series, cfg: DedupConfig, slim: bool = False
) -> pd.DataFrame:
    """Pure batch implementation — shared by the Spark UDF and the oracle.

    ``slim=True`` (the Spark UDF path) returns only the columns any
    Spark consumer reads (SLIM_FEATURE_SCHEMA); computation is identical
    — the dropped columns are intermediates either way."""
    seeds = H.perm_seeds(cfg.num_perm, cfg.seed)
    token_hashes, offsets = H.tokenize_batch(texts)
    sets = H.shingle_sets(token_hashes, offsets, cfg.shingle_k)
    sig = H.minhash_signatures(sets, seeds)
    bands = H.band_hashes(sig, cfg.bands, cfg.rows_per_band)
    sim = H.simhash64(token_hashes, offsets)
    chunks = H.simhash_chunks(sim, cfg.simhash_chunks)

    n_tokens = np.diff(offsets).astype(np.int32)
    # Stored shingle sets are truncated to the low 32 bits: the verify
    # stage uses them ONLY for equality (exact Jaccard), and 32 bits keep
    # the expected per-pair collision count at ~|A||B|/2^32 ≈ 1e-4 for
    # typical web pages — while HALVING the widest column in the feature
    # snapshot, both verify joins, and the Arrow transfer into the
    # Jaccard UDF. MinHash/band/anchor keys are still derived from the
    # full 64-bit domain above. np.unique re-sorts and dedups after
    # truncation, so each stored set stays sorted-unique (int32 order).
    stored_shingles = [
        np.unique((s.view(np.uint64) & np.uint64(0xFFFFFFFF))
                  .astype(np.uint32).view(np.int32))
        for s in sets
    ]

    # Packed blocking keys: one int64 per key, channel tag in the low
    # 2 bits — the whole candidate exchange then shuffles a single long
    # column instead of (channel string, key_id, hash) triples.
    def _pack(arr: np.ndarray, channel: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((arr & ~np.uint64(3)) | np.uint64(channel)).view(np.int64)

    band_keys = _pack(bands.view(np.uint64), CHANNEL_MINHASH)
    chunk_keys = _pack(chunks.view(np.uint64), CHANNEL_SIMCHUNK)

    # Anchors, batched: each set is already sorted-unique uint64
    # ascending, and the int64-sorted order the anchors were defined
    # over (np.sort of the signed view) is exactly the rotation
    # [values >= 2^63 block, values < 2^63 block] — so the per-doc
    # np.sort is replaced by one searchsorted, and ALL docs' anchors go
    # through a single mix64/_pack pass (the per-doc mix64 calls, each
    # with errstate setup, dominated this loop's profile).
    half = np.uint64(1 << 63)
    anchor_parts = []
    for s in sets:
        idx = int(np.searchsorted(s, half))
        n_hi = len(s) - idx
        if n_hi >= N_ANCHORS:
            anchor_parts.append(s[idx : idx + N_ANCHORS])
        elif n_hi > 0:
            anchor_parts.append(
                np.concatenate([s[idx:], s[: min(idx, N_ANCHORS - n_hi)]])
            )
        else:
            anchor_parts.append(s[:N_ANCHORS])
    n_docs = len(sets)
    anchor_lens = np.fromiter(
        (len(a) for a in anchor_parts), dtype=np.int64, count=n_docs
    )
    flat_anchors = (
        np.concatenate(anchor_parts)
        if n_docs
        else np.empty(0, dtype=np.uint64)
    )
    anchor_keys_flat = _pack(
        H.mix64(flat_anchors ^ _ANCHOR_SEED), CHANNEL_ANCHOR
    )
    bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(anchor_lens, out=bounds[1:])
    keys = [
        np.concatenate(
            [
                band_keys[i],
                chunk_keys[i],
                anchor_keys_flat[bounds[i] : bounds[i + 1]],
            ]
        )
        for i in range(n_docs)
    ]

    if slim:
        return pd.DataFrame(
            {
                "n_tokens": n_tokens,
                "shingles": stored_shingles,
                "simhash": sim.view(np.int64),
                "keys": keys,
            }
        )
    return pd.DataFrame(
        {
            "n_tokens": n_tokens,
            "n_shingles": np.array(
                [len(s) for s in stored_shingles], dtype=np.int32
            ),
            "shingles": stored_shingles,
            "minhash": list(sig.view(np.int64)),
            "bands": list(bands.view(np.int64)),
            "simhash": sim.view(np.int64),
            "simchunks": list(chunks.view(np.int64)),
            "keys": keys,
        }
    )


def make_features_udf(cfg: DedupConfig):
    """Build the pandas UDF with the config baked into the closure.

    The UDF ships the SLIM layout (see SLIM_FEATURE_SCHEMA): same
    kernel, smaller Arrow transfer."""

    @F.pandas_udf(SLIM_FEATURE_SCHEMA)
    def features_udf(text: pd.Series) -> pd.DataFrame:
        return compute_features_pdf(text, cfg, slim=True)

    return features_udf
