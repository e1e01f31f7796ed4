"""Cluster-graph statistics: degrees, hubs, bridges, cross-cluster pairs.

Reference parity:
* A6 degree computation — kg.graph.degree()
  (/root/reference/src/sift_kg/resolve/resolver.py:209,
  graph/communities.py:79);
* W3 top-N hubs + 1-hop neighbors
  (/root/reference/src/sift_kg/visualize.py:218-226);
* G3 bridge detection — nodes with neighbors in >= 2 communities
  (/root/reference/src/sift_kg/graph/communities.py:164-212);
* G5 ego-subgraph BFS to depth k
  (/root/reference/src/sift_kg/graph/communities.py:292-376);
* A8 cross-community pair counts — shared edges + distinct bridge nodes
  per community pair (/root/reference/src/sift_kg/graph/communities.py:
  264-289).

In this engine, confirmed dup edges are by construction intra-cluster
(clusters ARE the connected components of confirmed edges), so the
cross-cluster statistics are most meaningful over the REVIEW zone
(flagged pairs): they surface cluster pairs a human reviewer could merge
— exactly the reference's community-bridge use case.

All pure DataFrame programs: hash aggregations + two broadcast-friendly
joins against the assignments table; no driver-side data loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def degrees(
    edges: DataFrame, col_a: str = "url_a", col_b: str = "url_b"
) -> DataFrame:
    """(url, degree) over an undirected edge list."""
    endpoints = edges.select(F.col(col_a).alias("url")).unionByName(
        edges.select(F.col(col_b).alias("url"))
    )
    return endpoints.groupBy("url").agg(F.count("*").alias("degree"))


def top_hubs_with_neighbors(
    edges: DataFrame,
    n: int = 10,
    col_a: str = "url_a",
    col_b: str = "url_b",
) -> DataFrame:
    """Top-n nodes by degree plus their 1-hop neighbors (W3).

    Returns (hub_url, degree, rank, neighbor_url) — one row per
    hub-neighbor edge, ranks deterministic (degree desc, url asc).
    """
    deg = degrees(edges, col_a, col_b)
    # Distributed TopK (TakeOrderedAndProject) over the full degree table;
    # the ranking window then runs over the <= n surviving rows only — a
    # global Window.orderBy here previously pulled the WHOLE degree table
    # through one task.
    top = deg.orderBy(F.desc("degree"), F.asc("url")).limit(n)
    w = Window.orderBy(F.desc("degree"), F.asc("url"))
    hubs = top.withColumn("rank", F.row_number().over(w)).select(
        F.col("url").alias("hub_url"), "degree", "rank"
    )
    sym = edges.select(
        F.col(col_a).alias("hub_url"), F.col(col_b).alias("neighbor_url")
    ).unionByName(
        edges.select(
            F.col(col_b).alias("hub_url"), F.col(col_a).alias("neighbor_url")
        )
    )
    # hubs is n rows — broadcast side of the join
    return F.broadcast(hubs).join(sym, "hub_url").select(
        "hub_url", "degree", "rank", "neighbor_url"
    )


def ego_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    depth: int = 2,
    col_a: str = "url_a",
    col_b: str = "url_b",
) -> DataFrame:
    """(seed, node, hop) — nodes within ``depth`` undirected hops of each
    seed, ``hop`` = first-reach distance (G5 ego-subgraph BFS; reference
    walks neighbors-of-neighbors driver-side, communities.py:292-376).

    ``seeds``: one column named ``seed``. Distributed frontier expansion:
    each hop is one equi-join of the current frontier against the
    symmetric edge list plus an anti-join against the visited set (U4) —
    no driver-side adjacency, no quadratic re-expansion of already-seen
    nodes. ``depth`` is expected small (ego graphs); each iteration's
    frontier is localCheckpointed so plan depth stays O(1) per hop.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    sym = edges.select(
        F.col(col_a).alias("src"), F.col(col_b).alias("dst")
    ).unionByName(
        edges.select(F.col(col_b).alias("src"), F.col(col_a).alias("dst"))
    )
    frontier = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(0).alias("hop")
    )
    visited = frontier
    for h in range(1, depth + 1):
        frontier = (
            frontier.join(sym, frontier.node == sym.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("seed", "node"), ["seed", "node"], "leftanti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(frontier)
    return visited.filter(F.col("hop") > 0)


def _edges_with_clusters(
    edges: DataFrame,
    assignments: DataFrame,
    col_a: str = "url_a",
    col_b: str = "url_b",
) -> DataFrame:
    """Edge endpoints mapped through the url -> cluster_id assignment."""
    amap = assignments.select("url", "cluster_id")
    return (
        edges.select(F.col(col_a).alias("url_a"), F.col(col_b).alias("url_b"))
        .join(
            amap.select(
                F.col("url").alias("url_a"), F.col("cluster_id").alias("cluster_a")
            ),
            "url_a",
        )
        .join(
            amap.select(
                F.col("url").alias("url_b"), F.col("cluster_id").alias("cluster_b")
            ),
            "url_b",
        )
    )


def cross_cluster_pair_counts(
    edges: DataFrame,
    assignments: DataFrame,
    col_a: str = "url_a",
    col_b: str = "url_b",
) -> DataFrame:
    """(cluster_a, cluster_b, n_edges, n_bridge_docs) per cluster pair (A8).

    cluster_a < cluster_b (normalized orientation); n_bridge_docs =
    distinct docs participating in the pair's cross edges — the
    reference's connections-between-communities stat
    (communities.py:264-289).
    """
    e = _edges_with_clusters(edges, assignments, col_a, col_b).filter(
        F.col("cluster_a") != F.col("cluster_b")
    )
    normalized = e.select(
        F.least("cluster_a", "cluster_b").alias("cluster_a"),
        F.greatest("cluster_a", "cluster_b").alias("cluster_b"),
        "url_a",
        "url_b",
    )
    # Explode endpoints (2 rows per edge), then count / countDistinct —
    # two streaming hash aggregations. A collect_list variant would
    # materialize every endpoint url of a cluster pair in one aggregation
    # buffer: a hot pair with millions of cross edges OOMs that buffer,
    # while countDistinct spills like any hash agg.
    endpoints = normalized.select(
        "cluster_a", "cluster_b", F.explode(F.array("url_a", "url_b")).alias("url")
    )
    return endpoints.groupBy("cluster_a", "cluster_b").agg(
        (F.count("*") / 2).cast("long").alias("n_edges"),
        # int to keep the pre-refactor (F.size-based) output schema
        F.countDistinct("url").cast("int").alias("n_bridge_docs"),
    )


def bridge_docs(
    edges: DataFrame,
    assignments: DataFrame,
    col_a: str = "url_a",
    col_b: str = "url_b",
) -> DataFrame:
    """(url, own_cluster, n_foreign_clusters, n_cross_edges) for docs with
    >= 1 edge into another cluster (G3: neighbors in >= 2 communities)."""
    e = _edges_with_clusters(edges, assignments, col_a, col_b).filter(
        F.col("cluster_a") != F.col("cluster_b")
    )
    per_endpoint = e.select(
        F.col("url_a").alias("url"),
        F.col("cluster_a").alias("own_cluster"),
        F.col("cluster_b").alias("foreign_cluster"),
    ).unionByName(
        e.select(
            F.col("url_b").alias("url"),
            F.col("cluster_b").alias("own_cluster"),
            F.col("cluster_a").alias("foreign_cluster"),
        )
    )
    return per_endpoint.groupBy("url", "own_cluster").agg(
        F.countDistinct("foreign_cluster").alias("n_foreign_clusters"),
        F.count("*").alias("n_cross_edges"),
    )
