"""LSH-bucketed ANN: planted near-neighbors must be found; re-rank order
must be exact-cosine; deterministic across calls."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sift_kg_spark.operators.ann import ann_lsh_topk

DIM = 32


def _clustered_vectors(n_clusters=10, per_cluster=12, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.standard_normal(DIM)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + 0.12 * rng.standard_normal(DIM)
            rows.append(
                {"vec_id": vid, "cluster": c,
                 "embedding": (v / np.linalg.norm(v)).astype(np.float32).tolist()}
            )
            vid += 1
    return pd.DataFrame(rows)


class TestAnnLsh:
    def test_planted_neighbors_found(self, spark):
        pdf = _clustered_vectors()
        df = spark.createDataFrame(pdf)
        # small-N config: 8-bit bands maximize recall at moderate cosine
        # (~0.68 here); bucket blowup is a non-issue at N=120. The wide
        # 16-bit default targets the near-dup regime at corpus scale.
        topk = ann_lsh_topk(
            df, "vec_id", "embedding", DIM, k=5, n_planes=64, bits_per_band=8,
            query_filter=F.col("vec_id") < 20,
        ).toPandas()
        truth = dict(zip(pdf.vec_id, pdf.cluster))
        # planted same-cluster vectors have cosine ~0.97; noise pairs ~0 —
        # every retrieved neighbor of a query must be from its cluster
        assert len(topk) > 0
        hits = sum(
            1 for r in topk.itertuples() if truth[r.query_id] == truth[r.neighbor_id]
        )
        assert hits / len(topk) >= 0.9
        # rank-1 must always be a true planted neighbor
        top1 = topk[topk.rnk == 1]
        assert all(truth[r.query_id] == truth[r.neighbor_id] for r in top1.itertuples())
        # each query found most of its 11 planted neighbors
        per_q = topk.groupby("query_id").size()
        assert (per_q >= 4).all()

    def test_rerank_is_exact_cosine(self, spark):
        pdf = _clustered_vectors(n_clusters=3, per_cluster=8)
        df = spark.createDataFrame(pdf)
        topk = ann_lsh_topk(
            df, "vec_id", "embedding", DIM, k=3, n_planes=64, bits_per_band=8,
            query_filter=F.col("vec_id") == 0,
        ).toPandas().sort_values("rnk")
        vecs = {r.vec_id: np.array(r.embedding) for r in pdf.itertuples()}

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        for r in topk.itertuples():
            assert abs(cos(vecs[0], vecs[r.neighbor_id]) - r.cosine) < 1e-5
        assert list(topk.cosine) == sorted(topk.cosine, reverse=True)

    def test_deterministic(self, spark):
        pdf = _clustered_vectors(n_clusters=2, per_cluster=6)
        df = spark.createDataFrame(pdf)
        a = ann_lsh_topk(df, "vec_id", "embedding", DIM, k=3,
                         n_planes=64, bits_per_band=8).toPandas()
        b = ann_lsh_topk(df, "vec_id", "embedding", DIM, k=3,
                         n_planes=64, bits_per_band=8).toPandas()
        key = ["query_id", "rnk"]
        assert a.sort_values(key).neighbor_id.tolist() == b.sort_values(key).neighbor_id.tolist()


    def test_hot_bucket_cap_bounds_candidates(self, spark):
        """bucket_cap keeps the neighbor side of every band bucket bounded:
        with cap=3 no query can see more than 3*n_bands distinct candidates,
        and results stay deterministic."""
        pdf = _clustered_vectors(n_clusters=1, per_cluster=40)
        df = spark.createDataFrame(pdf)
        capped = ann_lsh_topk(
            df, "vec_id", "embedding", DIM, k=39, n_planes=64, bits_per_band=8,
            bucket_cap=3,
        ).toPandas()
        per_q = capped.groupby("query_id").size()
        assert (per_q <= 3 * 8).all()
        again = ann_lsh_topk(
            df, "vec_id", "embedding", DIM, k=39, n_planes=64, bits_per_band=8,
            bucket_cap=3,
        ).toPandas()
        key = ["query_id", "rnk"]
        assert capped.sort_values(key).neighbor_id.tolist() == \
            again.sort_values(key).neighbor_id.tolist()

class TestAnnIvf:
    """IVF-flat ANN (operators/ann.ann_ivf_topk): clustered corpora must
    reach full recall at a small probe fraction; re-rank shares the exact
    cosine path; the deterministic sampled quantizer reproduces."""

    def test_clustered_recall_small_probe(self, spark):
        from sift_kg_spark.operators.ann import ann_ivf_topk

        pdf = _clustered_vectors(n_clusters=10, per_cluster=12)
        df = spark.createDataFrame(pdf)
        # 16 cells, probe 4 (25% scan): same-cluster vectors (cosine
        # ~0.97) land in the same or adjacent cells, so retrieval stays
        # intra-cluster even though 75% of the corpus is never touched.
        topk = ann_ivf_topk(
            df, "vec_id", "embedding", DIM, k=5, n_centroids=16, n_probe=4,
            query_filter=F.col("vec_id") < 20,
        ).toPandas()
        truth = dict(zip(pdf.vec_id, pdf.cluster))
        assert len(topk) > 0
        hits = sum(
            1 for r in topk.itertuples() if truth[r.query_id] == truth[r.neighbor_id]
        )
        assert hits / len(topk) >= 0.9
        top1 = topk[topk.rnk == 1]
        assert all(truth[r.query_id] == truth[r.neighbor_id] for r in top1.itertuples())

    def test_deterministic_and_lloyd_refinement(self, spark):
        from sift_kg_spark.operators.ann import ann_ivf_topk, train_ivf_centroids

        pdf = _clustered_vectors(n_clusters=4, per_cluster=8)
        df = spark.createDataFrame(pdf)
        a = ann_ivf_topk(df, "vec_id", "embedding", DIM, k=3,
                         n_centroids=8, n_probe=3).toPandas()
        b = ann_ivf_topk(df, "vec_id", "embedding", DIM, k=3,
                         n_centroids=8, n_probe=3).toPandas()
        key = ["query_id", "rnk"]
        assert a.sort_values(key).neighbor_id.tolist() == \
            b.sort_values(key).neighbor_id.tolist()
        # Lloyd refinement keeps shape and moves centroids toward cluster
        # means (strictly reduces mean distance-to-centroid here)
        import numpy as np
        c0 = train_ivf_centroids(df, "vec_id", "embedding", 8, lloyd_iters=0)
        c2 = train_ivf_centroids(df, "vec_id", "embedding", 8, lloyd_iters=2)
        assert c0.shape == c2.shape == (8, DIM)
        vecs = np.asarray(pdf.embedding.tolist())

        def mean_best_dist(cents):
            d = np.linalg.norm(vecs[:, None, :] - cents[None, :, :], axis=2)
            return d.min(axis=1).mean()

        assert mean_best_dist(c2) <= mean_best_dist(c0) + 1e-9

    def test_cell_cap_bounds_candidates(self, spark):
        from sift_kg_spark.operators.ann import ann_ivf_topk

        pdf = _clustered_vectors(n_clusters=1, per_cluster=40)
        df = spark.createDataFrame(pdf)
        capped = ann_ivf_topk(
            df, "vec_id", "embedding", DIM, k=39, n_centroids=4, n_probe=1,
            cell_cap=5,
        ).toPandas()
        per_q = capped.groupby("query_id").size()
        # each query probes 1 cell; the neighbor side of every cell keeps
        # ~cap hash-selected members, so fan-in stays bounded (the hash
        # threshold is probabilistic: allow 3x slack over the cap)
        assert (per_q <= 15).all()
        again = ann_ivf_topk(
            df, "vec_id", "embedding", DIM, k=39, n_centroids=4, n_probe=1,
            cell_cap=5,
        ).toPandas()
        key = ["query_id", "rnk"]
        assert capped.sort_values(key).neighbor_id.tolist() == \
            again.sort_values(key).neighbor_id.tolist()


class TestSemanticDedup:
    def test_clustered_corpus_pruned_to_representatives(self, spark):
        """Tight clusters (noise 0.03 -> within-pair cosine ~0.97, ~0
        across) must collapse to one kept representative per cluster —
        exactly the min vec_id — with every member assigned that
        representative's component. (The shared fixture's 0.12 noise
        gives within-pair cosine ~0.68 — too loose for a 0.8-threshold
        dedup test.)"""
        from sift_kg_spark.operators.ann import semantic_dedup

        rng = np.random.default_rng(7)
        rows, vid = [], 0
        for c in range(8):
            center = rng.standard_normal(DIM)
            center /= np.linalg.norm(center)
            for _ in range(10):
                v = center + 0.03 * rng.standard_normal(DIM)
                rows.append(
                    {"vec_id": vid, "cluster": c,
                     "embedding": (v / np.linalg.norm(v)).astype(np.float32).tolist()}
                )
                vid += 1
        pdf = pd.DataFrame(rows)
        df = spark.createDataFrame(pdf)
        out = semantic_dedup(
            df, "vec_id", "embedding",
            threshold=0.8, n_centroids=16, n_probe=4,
        ).toPandas()
        assert len(out) == len(pdf)
        merged = out.merge(pdf[["vec_id", "cluster"]], on="vec_id")
        by_cluster = merged.groupby("cluster")
        # one component + one kept representative per planted cluster
        assert (by_cluster.component.nunique() == 1).all()
        assert (by_cluster.is_kept.sum() == 1).all()
        for _, g in by_cluster:
            keeper = g[g.is_kept == 1].vec_id.iloc[0]
            assert keeper == g.vec_id.min()

    def test_matches_bruteforce_components(self, spark):
        """With full probing the IVF-scoped pair graph must produce the
        same components as brute-force thresholding."""
        from sift_kg_spark.operators.ann import semantic_dedup

        pdf = _clustered_vectors(n_clusters=5, per_cluster=6, seed=11)
        df = spark.createDataFrame(pdf)
        out = (
            semantic_dedup(
                df, "vec_id", "embedding",
                threshold=0.8, n_centroids=8, n_probe=8,
            )
            .toPandas()
            .sort_values("vec_id")
        )
        # brute force in numpy: union-find over >= threshold pairs
        mat = np.asarray(pdf.embedding.tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1)[:, None]
        sims = mat @ mat.T
        parent = list(range(len(pdf)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(len(pdf)):
            for j in range(i + 1, len(pdf)):
                if sims[i, j] >= 0.8:
                    parent[find(i)] = find(j)
        want_rep = {i: min(k for k in range(len(pdf)) if find(k) == find(i))
                    for i in range(len(pdf))}
        got_kept = {r.vec_id for r in out.itertuples() if r.is_kept == 1}
        assert got_kept == set(want_rep.values())
        # component labels group identically
        got_comp = dict(zip(out.vec_id, out.component))
        for i in range(len(pdf)):
            for j in range(len(pdf)):
                same_want = want_rep[i] == want_rep[j]
                same_got = got_comp[i] == got_comp[j]
                assert same_want == same_got, (i, j)
