"""Pair verification + threshold review — Layers 2 (judgment) and 3.

The reference judges candidate groups with an LLM and then gates them with
auto-approve / auto-reject confidence thresholds, leaving the middle zone
as DRAFT for review (/root/reference/src/sift_kg/resolve/reviewer.py:39-77,
resolve/models.py:12-41). Our deterministic equivalents:

  score 1: exact Jaccard over the k-shingle hash sets of the pair
           (computed via a vectorized pandas UDF: np.intersect1d over the
           sorted-unique int64 arrays both docs already carry);
  score 2: SimHash64 Hamming distance — JVM-side, just
           ``bit_count(simhash_a ^ simhash_b)``, no Python;
  score 3: longest shared byte span (suffix-array stage, operators/suffix) —
           run ONLY for the gray zone that scores 1-2 leave undecided.

Decision (cfg thresholds; see config.py for the mapping rationale):
  J >= approve_jaccard                  -> CONFIRMED  decided_by=jaccard
  J <  reject_jaccard                   -> REJECTED
  gray zone & hamming <= h_confirm      -> CONFIRMED  decided_by=simhash
  gray zone & shared span >= min_span   -> CONFIRMED  decided_by=suffix
  otherwise                             -> FLAGGED (review table; excluded
                                           from clustering = DRAFT-not-
                                           applied semantics)

Pairs are keyed by the compact int64 ``doc_uid`` end-to-end; urls are
joined back onto the (small) verified table by the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sift_kg_spark.config import DedupConfig


@F.pandas_udf(T.DoubleType())
def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact Jaccard of two sorted-unique int64 arrays per row."""
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        xa, xb = a.iloc[i], b.iloc[i]
        if xa is None or xb is None or len(xa) == 0 or len(xb) == 0:
            out[i] = 0.0
            continue
        xa = np.asarray(xa, dtype=np.int64)
        xb = np.asarray(xb, dtype=np.int64)
        inter = np.intersect1d(xa, xb, assume_unique=True).size
        out[i] = inter / (len(xa) + len(xb) - inter)
    return pd.Series(out)


def verify_pairs(
    pairs: DataFrame, features: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Score candidate pairs; emit status CONFIRMED/REJECTED/FLAGGED.

    ``pairs``: uid_a, uid_b, channel, n_keys.
    ``features``: doc_uid, shingles, simhash (plus anything else; pruned
    here — Catalyst pushes this projection into the feature-table scan).

    FLAGGED rows still carry both scores; the suffix stage upgrades some of
    them afterwards. Two shuffle hash joins on the int64 uid.
    """
    feat = features.select("doc_uid", "shingles", "simhash")

    a = feat.select(
        F.col("doc_uid").alias("uid_a"),
        F.col("shingles").alias("_sh_a"),
        F.col("simhash").alias("_sim_a"),
    )
    b = feat.select(
        F.col("doc_uid").alias("uid_b"),
        F.col("shingles").alias("_sh_b"),
        F.col("simhash").alias("_sim_b"),
    )

    scored = (
        pairs.join(a, "uid_a")
        .join(b, "uid_b")
        .withColumn("jaccard", jaccard_udf("_sh_a", "_sh_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b"))).cast("int"),
        )
        .drop("_sh_a", "_sh_b", "_sim_a", "_sim_b")
    )

    status = (
        F.when(F.col("jaccard") >= cfg.approve_jaccard, F.lit("confirmed"))
        .when(F.col("jaccard") < cfg.reject_jaccard, F.lit("rejected"))
        .when(
            F.col("hamming") <= cfg.simhash_confirm_hamming, F.lit("confirmed")
        )
        .otherwise(F.lit("flagged"))
    )
    decided_by = (
        F.when(F.col("jaccard") >= cfg.approve_jaccard, F.lit("jaccard"))
        .when(F.col("jaccard") < cfg.reject_jaccard, F.lit("jaccard"))
        .when(F.col("hamming") <= cfg.simhash_confirm_hamming, F.lit("simhash"))
        .otherwise(F.lit(None).cast("string"))
    )
    return scored.withColumn("status", status).withColumn("decided_by", decided_by)
