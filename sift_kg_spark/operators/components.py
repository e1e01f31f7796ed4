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

    labels = (
        sym.select(F.col("src").alias("url"))
        .distinct()
        .withColumn("label", F.col("url"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        msgs = (
            sym.join(labels, sym.src == labels.url, "inner")
            .select(F.col("dst").alias("url"), "label")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("url")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "url")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select("url", F.col("label").alias("cluster_id"))
