"""Approximate nearest neighbors over an embedding column.

Two tiers, per the training-data-pipeline brief:

* brute force — exact cosine top-k via a crossJoin + window
  (functions/multimodal.cosine_topk); correct at any recall, O(N*Q).
* THIS module: random-hyperplane LSH (SimHash for vectors) — the scale
  path. sign(v . h) over ``n_planes`` seeded hyperplanes gives a bit
  signature whose Hamming distance estimates angular distance
  (Charikar, STOC'02); grouping ``bits_per_band``-bit bands into bucket
  keys turns top-k search into an equi-join + exact re-rank within
  buckets — the same exchange shape as the MinHash text path
  (operators/lsh.py), so the skew machinery there applies unchanged at
  10^12 scale.

Probability a pair with angle theta shares >= 1 of b bands of r bits:
1 - (1 - (1 - theta/pi)^r)^b.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sift_kg_spark.functions.hashing import mix64


def make_hyperplane_udf(dim: int, n_planes: int = 64, seed: int = 42):
    """pandas UDF: embedding array<float> -> array<bigint> band keys."""
    if n_planes % 8 != 0:
        raise ValueError("n_planes must be a multiple of 8")
    n_bands = n_planes // 8
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)

    @F.pandas_udf("array<bigint>")
    def hyperplane_keys(emb: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        bits = (mat @ planes) > 0  # (n, n_planes)
        packed = np.packbits(bits, axis=1, bitorder="little")  # (n, n_bands)
        out = []
        band_seed = mix64(np.arange(1, n_bands + 1, dtype=np.uint64))
        for row in packed:
            keys = mix64(row.astype(np.uint64) ^ band_seed).view(np.int64)
            out.append(keys)
        return pd.Series(out)

    return hyperplane_keys


def ann_lsh_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 64,
    seed: int = 42,
    query_filter=None,
) -> DataFrame:
    """Approximate top-k cosine neighbors per query id.

    ``query_filter``: optional Column predicate selecting query rows
    (default: all rows are queries). Candidates = pairs sharing >= 1
    hyperplane band; exact cosine re-rank within candidates.
    """
    keys_udf = make_hyperplane_udf(dim, n_planes, seed)
    sig = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        keys_udf(F.col(vec_col)).alias("bkeys"),
    )
    exploded = sig.select(
        "vid", F.posexplode("bkeys").alias("band_id", "band_key")
    )
    q = exploded
    if query_filter is not None:
        qids = embeddings.filter(query_filter).select(
            F.col(id_col).alias("vid")
        )
        q = exploded.join(qids, "vid")
    cand = (
        q.select(F.col("vid").alias("query_id"), "band_id", "band_key")
        .join(
            exploded.select(
                F.col("vid").alias("neighbor_id"), "band_id", "band_key"
            ),
            ["band_id", "band_key"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    dot = F.expr(
        "aggregate(zip_with(q_vec, n_vec, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nq = F.expr("sqrt(aggregate(q_vec, cast(0.0 as double), (acc, v) -> acc + v * v))")
    nn = F.expr("sqrt(aggregate(n_vec, cast(0.0 as double), (acc, v) -> acc + v * v))")
    scored = (
        cand.join(
            sig.select(F.col("vid").alias("query_id"), F.col("vec").alias("q_vec")),
            "query_id",
        )
        .join(
            sig.select(F.col("vid").alias("neighbor_id"), F.col("vec").alias("n_vec")),
            "neighbor_id",
        )
        .withColumn("cosine", dot / (nq * nn))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
