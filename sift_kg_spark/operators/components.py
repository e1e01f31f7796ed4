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
round truncates lineage so plans stay O(1) per iteration.

For adversarial long-diameter graphs (template chains at crawl scale) the
module also implements the alternating large-star/small-star contraction
of Kiveris et al. ("Connected Components in MapReduce and Beyond",
SoCC'14) — O(log^2 n) rounds independent of diameter
(``algorithm="star"``). Both phases are expressed as a join against the
per-node neighborhood minimum (one groupBy + one join per phase); no
``collect_list``, so a hot node's neighborhood never materializes in one
task. ``connected_components(algorithm="auto")`` keeps min-label
propagation (cheaper per round, optimal for the shallow graphs real dedup
produces) but switches to star contraction if propagation has not
converged after ``auto_switch_rounds`` rounds — diameter-robust without
paying the two-phase cost on the common case.

Labels are the node keys themselves (urls): min-label over a total order is
collision-free and deterministic — the cluster_id IS the lexicographically
smallest member url (at extreme scale a 128-bit url digest would shrink the
shuffle; functionally identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_contraction(sym: DataFrame, max_iterations: int) -> DataFrame:
    """Kiveris et al. alternating large-star/small-star contraction.

    Input: symmetrized distinct edge list (src, dst), no self-loops.
    Output: (url, cluster_id = component-min url). Converges in
    O(log^2 n) rounds regardless of diameter. Each phase is one
    groupBy(min) + one join — the neighborhood of a hot node is never
    materialized in a single task (no collect_list), so star-shaped
    boilerplate clusters with millions of members stay balanced.
    """
    # Orient every edge (hi, lo) with lo < hi: the phase algebra below
    # preserves this invariant (every emitted parent is a neighborhood
    # minimum, hence strictly smaller than its child).
    edges = (
        sym.select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig: tuple[int, int] | None = None
    for _ in range(max_iterations):
        # ---- large-star: for each u, attach every LARGER neighbor v to
        # m(u) = min(neighborhood(u) + {u}).  v > u only happens for
        # edges where u is the lo endpoint, so emit (hi, m(lo)).
        nbr_min = (
            edges.select(F.col("hi").alias("u"), F.col("lo").alias("n"))
            .unionByName(edges.select(F.col("lo").alias("u"), F.col("hi").alias("n")))
            .groupBy("u")
            .agg(F.min("n").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        large = (
            edges.join(nbr_min, edges.lo == nbr_min.u, "inner")
            .select(F.col("hi"), F.col("m").alias("lo"))
            .filter(F.col("lo") < F.col("hi"))
            .distinct()
        )
        # ---- small-star: for each u over its SMALLER neighbors
        # {lo : (u, lo)}: m = min of those; re-attach u and every lo to m.
        small_min = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(small_min, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(small_min.select("hi", F.col("m").alias("lo")))
            .distinct()
        )
        edges = small.localCheckpoint(eager=True)
        # Convergence signature: (edge count, order-free hash fold) in ONE
        # tiny agg over the checkpointed result — no exceptAll job.
        n, h = edges.agg(
            F.count("*"), F.bit_xor(F.xxhash64("hi", "lo"))
        ).first()
        sig = (n, h)
        if sig == prev_sig:
            break
        prev_sig = sig
    # At the fixpoint every edge is (member, component_min).
    return (
        edges.select(F.col("hi").alias("url"), F.col("lo").alias("cluster_id"))
        .unionByName(
            edges.select(F.col("lo").alias("url"), F.col("lo").alias("cluster_id"))
        )
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    node_col_a: str = "url_a",
    node_col_b: str = "url_b",
    algorithm: str = "auto",
    auto_switch_rounds: int = 12,
) -> DataFrame:
    """Return (url, cluster_id) for every node appearing in ``edges``.

    cluster_id = min url of the connected component.

    ``algorithm``: "label" = min-label propagation (O(diameter) rounds —
    optimal for the shallow star/chain graphs dedup produces); "star" =
    Kiveris large-star/small-star (O(log^2 n) rounds, diameter-proof);
    "auto" = propagate up to ``auto_switch_rounds`` rounds, then fall back
    to star contraction if still unconverged (adversarial chain corpora).
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

    # Round 1 fused into initialization: with label == url, the first
    # propagation round's neighborhood minimum is simply min(src) per
    # dst — no join against a label table needed. Labels start one round
    # ahead (least(url, min neighbor)); the fixpoint (and therefore the
    # result) is unchanged, the loop below just converges one round
    # earlier.
    first_nbr = sym.groupBy(F.col("dst").alias("url")).agg(
        F.min("src").alias("_nbr")
    )
    labels = (
        sym.select(F.col("src").alias("url"))
        .distinct()
        .join(first_nbr, "url", "left")
        .select(
            "url",
            F.least(F.col("url"), F.coalesce("_nbr", "url")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )

    from pyspark.sql import Observation

    spark.conf.set("spark.sql.shuffle.partitions", str(cc_parts))

    try:
        if algorithm == "star":
            return _star_contraction(sym, max_iterations)
        prop_rounds = (
            auto_switch_rounds if algorithm == "auto" else max_iterations
        )
        converged = False
        for _ in range(prop_rounds):
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
                converged = True
                break
        if not converged and algorithm == "auto":
            # Diameter exceeded the propagation budget (adversarial chain
            # graph): finish with the O(log^2 n) contraction. Partial
            # labels are discarded — star restarts from the edge list,
            # whose cost does not depend on how far propagation got.
            return _star_contraction(sym, max_iterations)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)

    return labels.select("url", F.col("label").alias("cluster_id"))
