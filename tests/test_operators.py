"""Operator-level Spark tests: exact stage, LSH exchange + hot-band star,
verify thresholds, connected components. Micro-fixtures mirror the
reference's unit matrix (/root/reference/tests/test_prededup.py:42-164,
test_resolve.py:153-270, test_communities.py:8-38)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sift_kg_spark.config import DedupConfig
from sift_kg_spark.operators.components import connected_components
from sift_kg_spark.operators.exact import exact_dup_pairs, exact_representatives
from sift_kg_spark.operators.lsh import candidate_pairs

CFG = DedupConfig()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, lang string, text_norm string")


class TestExactStage:
    def test_star_edges_to_min_url(self, spark):
        docs = _docs(
            spark,
            [("u3", "en", "same text"), ("u1", "en", "same text"),
             ("u2", "en", "same text"), ("u9", "en", "other text")],
        )
        pairs = exact_dup_pairs(docs, CFG).collect()
        assert {(r.url_a, r.url_b) for r in pairs} == {("u2", "u1"), ("u3", "u1")}

    def test_cross_lang_not_merged(self, spark):
        # per-lang grouping = the reference's per-entity-type grouping
        # (test_prededup.py:109-116: same name, different type -> no merge)
        docs = _docs(spark, [("a", "en", "same"), ("b", "es", "same")])
        assert exact_dup_pairs(docs, CFG).count() == 0
        cfg_nolang = DedupConfig(partition_by_lang=False)
        assert exact_dup_pairs(docs, cfg_nolang).count() == 1

    def test_representatives_unique_per_sha(self, spark):
        docs = _docs(
            spark,
            [("u2", "en", "x"), ("u1", "en", "x"), ("u3", "en", "y")],
        ).withColumn("sha", F.sha2("text_norm", 256))
        reps = exact_representatives(docs, CFG)
        assert {r.url for r in reps.collect()} == {"u1", "u3"}


class TestCandidatePairs:
    def _keys(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, lang string, channel string, key_id int, key_hash long"
        )

    def test_small_bucket_all_pairs(self, spark):
        keys = self._keys(
            spark,
            [("a", "en", "minhash", 0, 7), ("b", "en", "minhash", 0, 7),
             ("c", "en", "minhash", 0, 7)],
        )
        got = {(r.url_a, r.url_b) for r in candidate_pairs(keys, CFG).collect()}
        assert got == {("a", "b"), ("a", "c"), ("b", "c")}

    def test_hot_bucket_star_reduction(self, spark):
        cfg = DedupConfig(hot_band_cap=4)
        n = 10
        keys = self._keys(
            spark, [(f"u{i:02d}", "en", "minhash", 0, 5) for i in range(n)]
        )
        pairs = candidate_pairs(keys, cfg).collect()
        # star: n-1 pairs, all against the min url
        assert len(pairs) == n - 1
        assert all(r.url_a == "u00" for r in pairs)

    def test_key_id_isolation(self, spark):
        # same hash in different band positions must not pair
        keys = self._keys(
            spark,
            [("a", "en", "minhash", 0, 7), ("b", "en", "minhash", 1, 7)],
        )
        assert candidate_pairs(keys, CFG).count() == 0

    def test_lang_isolation(self, spark):
        keys = self._keys(
            spark,
            [("a", "en", "minhash", 0, 7), ("b", "es", "minhash", 0, 7)],
        )
        assert candidate_pairs(keys, CFG).count() == 0


class TestConnectedComponents:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "url_a string, url_b string")

    def test_two_clusters_bridge_and_singleton(self, spark):
        # mirror of test_communities.py:8-38: two dense clusters + bridge
        edges = self._edges(
            spark,
            [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
             ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
             ("a3", "b1")],  # bridge joins them into ONE component
        )
        labels = {r.url: r.cluster_id for r in connected_components(edges).collect()}
        assert len(set(labels.values())) == 1
        assert set(labels.values()) == {"a1"}

    def test_disjoint_components(self, spark):
        edges = self._edges(spark, [("a", "b"), ("c", "d"), ("x", "y"), ("y", "z")])
        labels = {r.url: r.cluster_id for r in connected_components(edges).collect()}
        assert labels == {"a": "a", "b": "a", "c": "c", "d": "c",
                          "x": "x", "y": "x", "z": "x"}

    def test_chain_transitive_closure(self, spark):
        """A~B, B~C, C~D with no direct A~D — matches the reference's
        iterate-apply_merges-until-fixpoint semantics (README.md:552-562)."""
        edges = self._edges(spark, [("d", "c"), ("b", "a"), ("c", "b")])
        labels = {r.url: r.cluster_id for r in connected_components(edges).collect()}
        assert set(labels.values()) == {"a"}

    def test_star(self, spark):
        edges = self._edges(spark, [(f"m{i}", "hub") for i in range(10)])
        labels = {r.url: r.cluster_id for r in connected_components(edges).collect()}
        assert len(set(labels.values())) == 1


class TestVerifyThresholds:
    def test_three_way_split(self, spark):
        """DRAFT/approve/reject semantics on controlled Jaccard levels."""
        import pandas as pd

        from sift_kg_spark.functions.features import compute_features_pdf
        from sift_kg_spark.operators.verify import verify_pairs

        words = [f"tok{i}" for i in range(200)]
        base = " ".join(words)
        near = " ".join(words[:-4] + ["x1", "x2", "x3", "x4"])     # J high
        half = " ".join(words[:120] + [f"z{i}" for i in range(80)])  # gray: J~0.42
        other = " ".join(f"q{i}" for i in range(200))               # J ~ 0

        texts = pd.Series([base, near, half, other])
        f = compute_features_pdf(texts, CFG)
        urls = ["base", "near", "half", "other"]
        feat = spark.createDataFrame(
            pd.DataFrame(
                {"url": urls,
                 "shingles": [s.tolist() for s in f.shingles],
                 "simhash": f.simhash}
            )
        )
        pairs = spark.createDataFrame(
            [("base", "near", "minhash", 3), ("base", "half", "minhash", 1),
             ("base", "other", "minhash", 1)],
            "url_a string, url_b string, channel string, n_keys long",
        )
        got = {(r.url_a, r.url_b): r for r in verify_pairs(pairs, feat, CFG).collect()}
        assert got[("base", "near")].status == "confirmed"
        assert got[("base", "near")].decided_by in ("jaccard", "simhash")
        assert got[("base", "other")].status == "rejected"
        assert got[("base", "half")].status == "flagged"
        assert 0.0 <= got[("base", "half")].jaccard < CFG.approve_jaccard
