"""Exact decision parity: Spark pipeline vs the single-process oracle.

Strictly stronger than the >= 0.99 recall gate — cluster assignments,
canonical picks, AND the per-pair confirm/flag decisions must be equal.
Also pins the pure-Python XXH64 against Spark's xxhash64 (the oracle's
uid-dependent choices depend on it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sift_kg_spark.fixtures import generate_corpus
from sift_kg_spark.oracle import run_dedup_oracle, xxh64
from sift_kg_spark.pipeline import run_dedup


class TestXXH64:
    def test_matches_spark(self, spark):
        samples = ["", "a", "hello world", "https://host01.example/d3/000123/1",
                   "x" * 100, "éü unicode"]
        df = spark.createDataFrame([(s,) for s in samples], "s string")
        got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
        for s in samples:
            assert xxh64(s.encode("utf-8")) == got[s], s


class TestDecisionParity:
    def test_spark_equals_oracle(self, spark, cfg):
        pages_pdf, *_ = generate_corpus(250, seed=123)
        pages_pdf = pages_pdf.drop(columns=["true_text"])
        spark_res = run_dedup(spark, spark.createDataFrame(pages_pdf), cfg)
        oracle_res = run_dedup_oracle(pages_pdf, cfg)

        # quarantine parity
        got_q = {r.url for r in spark_res.quarantine.collect()}
        assert got_q == set(oracle_res.quarantine)

        # assignment parity: same cluster ids (min-url labels), canonical,
        # sizes — for every url
        got = {
            r.url: (r.cluster_id, r.canonical_url, r.cluster_size)
            for r in spark_res.assignments.collect()
        }
        want = {
            r.url: (r.cluster_id, r.canonical_url, r.cluster_size)
            for r in oracle_res.assignments.itertuples()
        }
        assert got == want

        # pair-decision parity on the LSH path (exact-channel pairs are
        # handled before blocking in both implementations)
        got_pairs = {
            (r.url_a, r.url_b): r.status
            for r in spark_res.dup_pairs.filter(
                F.col("channel") != "exact"
            ).collect()
        }
        assert got_pairs == oracle_res.pair_status
