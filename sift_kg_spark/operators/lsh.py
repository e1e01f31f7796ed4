"""Candidate generation — the salted band-hash exchange (Layer 2 blocking).

Replaces the reference's blocking strategies (sorted sliding windows
100/20 at /root/reference/src/sift_kg/resolve/resolver.py:248-269, KMeans
clusters at resolve/clustering.py:23-92, SemHash at graph/prededup.py:
120-139) with three deterministic key channels, all flowing through ONE
shuffle exchange:

  * ``minhash`` — LSH band keys: P[pair in >=1 band] = 1-(1-J^r)^b
    (probabilistic recall channel; b=32, r=4 by default).
  * ``simchunk`` — SimHash chunk keys: pigeonhole-deterministic for pairs
    with Hamming < n_chunks.
  * ``anchor``  — bottom-k shingle anchors: containment channel — if
    A ⊆ B, P[B's k smallest shingles all miss A] ≈ (1-|A|/|B|)^k.

Skew handling (north rule, explicit half): a boilerplate-heavy corpus makes
some band keys enormous. Bucket sizes are computed first
(groupBy(key).count()); buckets over ``hot_band_cap`` switch from all-pairs
(O(n^2)) to STAR pairing against the bucket's min-url member (O(n)),
preserving intra-bucket connectivity for true dup families while bounding
pair volume. AQE skew-join splitting (session.py) is the built-in half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sift_kg_spark.config import DedupConfig

N_ANCHORS = 8


def explode_keys(features: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, lang, channel, key_id, key_hash) — one row per blocking key.

    ``posexplode`` keeps the key index so identical hashes in different
    band positions never alias (the band seed already guarantees this for
    minhash bands; keeping key_id also aids skew diagnostics in metrics).
    """
    base = features.select("url", "lang", "bands", "simchunks", "shingles")

    band_keys = base.select(
        "url",
        "lang",
        F.lit("minhash").alias("channel"),
        F.posexplode("bands").alias("key_id", "key_hash"),
    )
    chunk_keys = base.select(
        "url",
        "lang",
        F.lit("simchunk").alias("channel"),
        F.posexplode("simchunks").alias("key_id", "key_hash"),
    )
    # bottom-k shingle anchors: shingles are stored sorted (int64 bit-view of
    # uint64 — int64 order differs from uint64 order, but ANY deterministic
    # order works: "bottom-k" just needs to pick the same k elements of the
    # set on both sides, and slicing the sorted array does).
    # NOTE: anchors match by VALUE (a shared rare shingle), not by position —
    # key_id is constant 0, unlike the positional band/chunk channels.
    anchor_keys = base.select(
        "url",
        "lang",
        F.lit("anchor").alias("channel"),
        F.lit(0).alias("key_id"),
        F.explode(F.slice("shingles", 1, N_ANCHORS)).alias("key_hash"),
    )
    return band_keys.unionByName(chunk_keys).unionByName(anchor_keys)


def candidate_pairs(keys: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct (url_a < url_b) candidate pairs from the key exchange.

    Returns columns: url_a, url_b, channel (first channel that produced the
    pair, by fixed channel precedence), n_keys (how many keys co-fired —
    a useful similarity prior and skew diagnostic).
    """
    key_cols = ["channel", "key_id", "key_hash"]
    if cfg.partition_by_lang:
        key_cols = ["lang", *key_cols]

    # Bucket sizes first; only multi-member buckets matter for pairing.
    # Filtering BEFORE the join back shrinks the size table from
    # O(total keys) (dominated by singleton buckets) to O(collisions) —
    # small enough that AQE turns the join into a broadcast at bench
    # scale, and orders of magnitude less shuffle at any scale.
    sizes = (
        keys.groupBy(*key_cols)
        .agg(F.count("*").alias("bucket_size"), F.min("url").alias("bucket_rep"))
        .filter(F.col("bucket_size") > 1)
    )
    keyed = keys.join(sizes, on=key_cols, how="inner")

    normal = keyed.filter(F.col("bucket_size") <= cfg.hot_band_cap)
    hot = keyed.filter(F.col("bucket_size") > cfg.hot_band_cap)

    left = normal.select(*key_cols, F.col("url").alias("url_a"))
    right = normal.select(*key_cols, F.col("url").alias("url_b"))
    all_pairs = left.join(right, on=key_cols, how="inner").filter(
        F.col("url_a") < F.col("url_b")
    )

    star_pairs = hot.filter(F.col("url") != F.col("bucket_rep")).select(
        *key_cols,
        F.least("url", "bucket_rep").alias("url_a"),
        F.greatest("url", "bucket_rep").alias("url_b"),
    )

    pairs = all_pairs.select("url_a", "url_b", "channel").unionByName(
        star_pairs.select("url_a", "url_b", "channel")
    )
    # Collapse the multi-band / multi-channel multiplicity in one hash agg.
    channel_rank = (
        F.when(F.col("channel") == "minhash", 0)
        .when(F.col("channel") == "simchunk", 1)
        .otherwise(2)
    )
    collapsed = (
        pairs.withColumn("_rank", channel_rank)
        .groupBy("url_a", "url_b")
        .agg(
            F.count("*").alias("n_keys"),
            F.min(F.struct("_rank", "channel")).alias("_best"),
        )
        .select("url_a", "url_b", F.col("_best.channel").alias("channel"), "n_keys")
    )
    # Precision gate: a full MinHash band match (rows_per_band agreeing
    # minima) is strong evidence on its own; an anchor or simchunk pair
    # needs >= 2 co-firing keys. A single shared shingle between unrelated
    # docs is common at corpus scale and was the dominant junk-pair source;
    # true containment pairs share ~k*|A|/|B| of their bottom-k anchors,
    # so requiring 2 keeps them (verified by the D5 recall gate).
    return collapsed.filter(
        (F.col("channel") == "minhash") | (F.col("n_keys") >= 2)
    )


def bucket_size_histogram(keys: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Skew diagnostic for the metrics table: bucket-size distribution per
    channel (log2 buckets)."""
    key_cols = ["channel", "key_id", "key_hash"]
    if cfg.partition_by_lang:
        key_cols = ["lang", *key_cols]
    return (
        keys.groupBy(*key_cols)
        .count()
        .withColumn("log2_size", F.floor(F.log2("count")))
        .groupBy("channel", "log2_size")
        .agg(F.count("*").alias("n_buckets"), F.sum("count").alias("n_keys"))
        .orderBy("channel", "log2_size")
    )
