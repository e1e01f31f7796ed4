"""Standalone SimHash-Hamming near-duplicate detection.

Inside the main pipeline the SimHash channel exists only as one of the
three packed blocking-key channels (operators/lsh) plus the verify-stage
Hamming confirm (operators/verify). This module exposes the same
machinery as a SELF-CONTAINED operator for users who want Hamming-only
dedup (Charikar 2002; the Google near-dup crawl filter of Manku et al.
WWW'07): one 64-bit fingerprint per document, chunk-pair blocking, and a
``bit_count(xor)`` confirm — no MinHash, no suffix stage.

Reference analog: the fuzzy pre-dedup confirm in
/root/reference/src/sift_kg/graph/prededup.py:120-139 (embedding
similarity >= 0.95 collapses near-identical names); here the confirm is
the deterministic Hamming gate the north rule prescribes.

Scale shape (10^12 docs):

* fingerprints — one Arrow-batched pandas UDF pass (the exact
  ``hashing.simhash64`` kernel the pipeline uses, so fingerprints agree
  engine-wide), narrow, fuses with the scan.
* blocking keys — JVM-only bit slicing of the int64 fingerprint
  (shiftrightunsigned/AND inside whole-stage codegen): C(n_chunks, 2)
  chunk-pair keys per doc. Pigeonhole guarantee: Hamming(a, b) <=
  n_chunks - 2 implies >= 2 clean chunks, hence >= 1 shared key — the
  candidate channel is DETERMINISTIC, not probabilistic.
* pairing — the single-exchange window shape shared with
  ``operators/lsh.candidate_pairs``: bucket size/rep from a window over
  the one key shuffle, buckets over ``hot_cap`` degrade to O(n) star
  pairing against the min-id representative.
* confirm — ``bit_count(a ^ b) <= max_hamming`` on the joined
  fingerprints: pure codegen, no Python on the pair path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sift_kg_spark.functions.hashing import simhash64, tokenize_batch


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text (int64 bit-view of the uint64 kernel)."""
    token_hashes, offsets = tokenize_batch(texts)
    return pd.Series(simhash64(token_hashes, offsets).view("int64"))


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — one 64-bit fingerprint per document."""
    return docs.select(id_col, simhash_udf(F.col(text_col)).alias("simhash"))


def _chunk_pair_keys(sim, n_chunks: int):
    """JVM chunk-pair blocking keys for one int64 simhash column.

    Mirrors ``hashing.simhash_chunks`` semantics (two chunks per key =>
    2*64/n_chunks bits of signal; single-chunk keys collide
    quadratically) but runs entirely in codegen: the (i, j) chunk pair is
    packed into one long and salted with the pair index via xxhash64 so
    identical chunk VALUES in different positions never alias.
    """
    width = 64 // n_chunks
    mask = F.lit((1 << width) - 1)
    chunks = [
        F.shiftrightunsigned(sim, c * width).bitwiseAND(mask)
        for c in range(n_chunks)
    ]
    keys = []
    for i in range(n_chunks):
        for j in range(i + 1, n_chunks):
            packed = F.shiftleft(chunks[i], width).bitwiseOR(chunks[j])
            keys.append(F.xxhash64(packed, F.lit(i * n_chunks + j)))
    return F.array(*keys)


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    n_chunks: int = 4,
    hot_cap: int = 64,
    salted_sizing: bool = False,
) -> DataFrame:
    """(id_a, id_b, hamming) — document pairs at Hamming distance
    <= ``max_hamming``, ``id_a < id_b``.

    Candidate recall: deterministic for pairs with Hamming <=
    ``n_chunks - 2``; pairs between that and ``max_hamming`` are found
    iff they keep two clean chunks (callers needing the guarantee at
    larger distances raise ``n_chunks``). One key exchange, one pairing
    join, hot buckets star-paired — the same 100-TB shape as the LSH
    candidate exchange.

    Sizing goes through ``lsh.sized_buckets`` (was an inline un-salted
    window): the sized table is pinned once and read by both pairing
    sides instead of re-running the fingerprint UDF chain per side, and
    ``salted_sizing=True`` swaps in the two-level pre-salted count for
    corpora where one template fingerprint owns a mega-bucket (the
    Manku near-constant-page case) — bit-identical output either way,
    same hatch winnow/lsh already expose.
    """
    from sift_kg_spark.operators.lsh import sized_buckets

    if 64 % n_chunks != 0:
        raise ValueError("n_chunks must divide 64")
    # Pin the fingerprint table (16 B/row): the pairing self-join's two
    # sides each re-execute their subtree (AQE's same-round stage
    # materialization does not deduplicate identical sibling exchanges —
    # PLANS.md §11 seam), and without the pin that means running the
    # simhash UDF pass twice. The narrowest possible proxy (guide §8).
    from pyspark import StorageLevel

    fps = simhash_fingerprints(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    keys = fps.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(_chunk_pair_keys(F.col("simhash"), n_chunks)).alias("key"),
    )
    sized = sized_buckets(
        keys, ["key"], "_id", salted=salted_sizing
    ).withColumnRenamed("bucket_rep", "rep")
    # single-join pairing (see lsh.candidate_pairs for the AQE rationale):
    # a-side = normal-bucket members + hot-bucket reps; rep is the bucket
    # min so star pairs always satisfy a < b.
    a_side = sized.filter(
        (F.col("bucket_size") <= hot_cap) | (F.col("_id") == F.col("rep"))
    ).select("key", F.col("_id").alias("id_a"), F.col("simhash").alias("_sa"))
    b_side = sized.select(
        "key", F.col("_id").alias("id_b"), F.col("simhash").alias("_sb")
    )
    # merge hint: same rationale as lsh.candidate_pairs — tiny size
    # estimates otherwise broadcast-build one side, re-running the
    # fingerprint UDF chain instead of reusing the key exchange.
    return (
        a_side.join(b_side.hint("merge"), "key")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
