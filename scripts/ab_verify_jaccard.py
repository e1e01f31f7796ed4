"""Same-session A/B: verify-stage Jaccard via JVM array_intersect (current
verify_pairs) vs the vectorized pandas-UDF kernel (jaccard_udf), on the
webtext corpus candidate pairs. Alternating noop-sink runs in ONE Spark
session so host-window drift cannot masquerade as a code effect.

Usage: python scripts/ab_verify_jaccard.py [sf] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from sift_kg_spark import DedupConfig, get_spark
from sift_kg_spark.functions.features import make_features_udf
from sift_kg_spark.operators.exact import exact_representatives
from sift_kg_spark.operators.lsh import candidate_pairs, explode_keys
from sift_kg_spark.operators.verify import jaccard_udf, verify_pairs
from sift_kg_spark.pipeline import prepare_stage


def verify_pairs_udf(pairs, features, cfg):
    """The pre-r6 shape: pandas-UDF Jaccard (kept verbatim for the A/B)."""
    feat = features.select("doc_uid", "shingles", "simhash")
    uids = (
        pairs.select(F.col("uid_a").alias("doc_uid"))
        .unionByName(pairs.select(F.col("uid_b").alias("doc_uid")))
        .distinct()
    )
    feat = feat.join(uids, "doc_uid", "leftsemi")
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
        .withColumn("jaccard", jaccard_udf(F.col("_sh_a"), F.col("_sh_b")))
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
    return scored.withColumn("status", status).withColumn(
        "decided_by", decided_by
    )


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = os.path.join(repo_root, "data", f"webtext_sf{sf}", "pages.parquet")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"ab_verify_sf{sf}", cores=cpus,
        shuffle_partitions=max(cpus, 8),
    )
    cfg = DedupConfig()
    pages = spark.read.parquet(corpus)
    n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    prepared = prepare_stage(pages, cfg, n_partitions).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    docs = prepared.filter(F.col("reason").isNull()).drop("reason")
    udf = make_features_udf(cfg)
    features = (
        exact_representatives(docs, cfg)
        .select(
            "doc_uid", "url", "lang", "n_chars",
            udf(F.col("text_norm")).alias("f"),
        )
        .select(
            "doc_uid", "url", "lang", "n_chars",
            "f.n_tokens", "f.shingles", "f.simhash", "f.keys",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    candidates = candidate_pairs(explode_keys(features, cfg), cfg).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    print("candidates:", candidates.count(), file=sys.stderr)
    features.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results = {"jvm": [], "udf": []}
    for r in range(n_rounds):
        for tag, fn in (("jvm", verify_pairs), ("udf", verify_pairs_udf)):
            spark.sparkContext.setJobDescription(f"ab-verify {tag} r{r}")
            t0 = time.monotonic()
            noop(fn(candidates, features, cfg))
            dt = round(time.monotonic() - t0, 2)
            results[tag].append(dt)
            print(f"  round {r} {tag}: {dt} s", file=sys.stderr)
    # equivalence spot check: order-free checksum of decisions
    chk = {}
    for tag, fn in (("jvm", verify_pairs), ("udf", verify_pairs_udf)):
        df = fn(candidates, features, cfg).select(
            "uid_a", "uid_b", "status",
            F.round(F.col("jaccard"), 9).alias("j"), "hamming",
        )
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(
                F.xxhash64("uid_a", "uid_b", "status", "j", "hamming")
            ).alias("h"),
        ).first()
        chk[tag] = (row["n"], row["h"])
    print({"timings": results, "checksum": chk})
    return 0


if __name__ == "__main__":
    sys.exit(main())
