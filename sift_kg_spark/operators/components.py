"""Distributed connected components — Layer 4 (merge application).

The reference applies CONFIRMED merge proposals by graph surgery and
re-runs resolve iteratively until no new duplicates appear
(/root/reference/src/sift_kg/resolve/engine.py:11-137,
/root/reference/README.md "iterative resolution"). Connected components
over the confirmed dup-pair edge list computes exactly that fixpoint —
the transitive closure of iterated apply_merges — in one job.

Algorithm: hash-partitioned iterative min-label propagation on DataFrames
(pure pyspark.sql — no GraphX/graphframes dependency):

    label(v) <- min(label(v), min over neighbors u of label(u))

over the symmetrized edge list, iterating until no label changes.
Converges in O(graph diameter) rounds; dup clusters are stars/short chains
(diameter <= a few), so 2-4 rounds in practice. ``localCheckpoint()`` per
round truncates lineage so plans stay O(1) per iteration. For adversarial
long-chain graphs at 10^12 scale, the large-star/small-star contraction of
Kiveris et al. ("Connected Components in MapReduce and Beyond", SoCC'14)
halves path lengths per round — noted as the upgrade path; dedup graphs do
not exhibit such chains.

Labels are the node keys themselves (urls): min-label over a total order is
collision-free and deterministic — the cluster_id IS the lexicographically
smallest member url (at extreme scale a 128-bit url digest would shrink the
shuffle; functionally identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    node_col_a: str = "url_a",
    node_col_b: str = "url_b",
) -> DataFrame:
    """Return (url, cluster_id) for every node appearing in ``edges``.

    cluster_id = min url of the connected component.
    """
    sym = (
        edges.select(
            F.col(node_col_a).alias("src"), F.col(node_col_b).alias("dst")
        )
        .unionByName(
            edges.select(
                F.col(node_col_b).alias("src"), F.col(node_col_a).alias("dst")
            )
        )
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    # Size the iteration shuffles to the GRAPH, not the cluster default:
    # the dup-pair graph is orders of magnitude smaller than the corpus
    # (only docs with candidate edges appear), and per-iteration task
    # scheduling dominates when a 40k-edge graph runs 32-way. ~200k edges
    # per partition keeps tasks meaningful at any scale.
    n_edges = sym.count()
    spark = sym.sparkSession
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    cc_parts = max(1, min(int(old_shuffle), n_edges // 200_000 + 1))

    labels = (
        sym.select(F.col("src").alias("url"))
        .distinct()
        .withColumn("label", F.col("url"))
        .localCheckpoint(eager=True)
    )

    from pyspark.sql import Observation

    spark.conf.set("spark.sql.shuffle.partitions", str(cc_parts))

    try:
        for _ in range(max_iterations):
            nbr_min = (
                sym.join(labels, sym.src == labels.url, "inner")
                .groupBy(F.col("dst").alias("url"))
                .agg(F.min("label").alias("nbr"))
            )
            obs = Observation()
            updated = (
                labels.join(nbr_min, "url", "left")
                .select(
                    "url",
                    F.least(F.col("label"), F.coalesce("nbr", "label")).alias("label"),
                    (F.col("nbr") < F.col("label")).cast("long").alias("_chg"),
                )
                # change count rides on the checkpoint action via
                # Observation — no separate convergence-check job per round
                .observe(obs, F.sum("_chg").alias("n_changed"))
            )
            labels = updated.drop("_chg").localCheckpoint(eager=True)
            if not obs.get["n_changed"]:
                break
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)

    return labels.select("url", F.col("label").alias("cluster_id"))
