"""Incremental (append-batch) dedup: new pages join an existing corpus.

The reference re-runs its resolve loop over the whole graph whenever new
documents arrive (/root/reference/src/sift_kg/resolve/engine.py:11-137 —
iterative full-graph passes). At crawl scale that is untenable: a daily
batch must cost O(batch), not O(corpus). This module implements the
append workflow against a completed base run's snapshot directory:

  1. prepare the new batch (same extraction/normalization/quarantine);
     re-key any doc_uid colliding with the base corpus;
  2. exact stage: new shas join base representatives (semi-join keeps the
     base scan pruned to sha/url); star edges within new-only sha groups;
  3. signatures computed ONLY for new distinct texts — base signatures
     are read back from the base feature snapshot, never recomputed;
  4. candidate generation over buckets touched by >= 1 new key
     (operators/lsh.candidate_pairs_incremental) — base×base pairs never
     regenerate;
  5. verify/suffix on the new pairs only, reading base features/texts for
     the base-side docs;
  6. clustering by CONTRACTION: base clusters enter the component graph
     as single supernodes (their cluster_id IS their min-url label), new
     confirmed edges connect supernodes and new docs, and connected
     components runs over this contracted graph — orders of magnitude
     smaller than the corpus. Untouched base clusters are carried over
     without rewriting; only merged clusters recompute the A1 canonical.

Equivalence contract: per-pair decisions are identical to the full run
(same deterministic scores/thresholds); the final partition equals the
full run on the combined corpus whenever candidate coverage does (planted
-class equivalence is pinned by tests/test_incremental.py). cluster_id =
min member url and the A1 canonical rule hold globally because min-label
contraction composes: min(min(A), min(B)) = min(A ∪ B).

At 10^12 scale the base `features` read is pruned to (doc_uid, lang,
keys) by parquet column pruning; a production deployment would maintain
the exploded key table as its own bucketed snapshot to avoid even that —
noted as the Iceberg-upgrade seam (tableio.py docstring).
"""

from __future__ import annotations

from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sift_kg_spark.config import DEFAULT_CONFIG, DedupConfig
from sift_kg_spark.functions.features import make_features_udf
from sift_kg_spark.operators.components import connected_components
from sift_kg_spark.operators.exact import exact_dup_pairs
from sift_kg_spark.operators.lsh import candidate_pairs_incremental, explode_keys
from sift_kg_spark.operators.suffix import confirm_spans
from sift_kg_spark.operators.verify import verify_pairs
from sift_kg_spark.pipeline import PAIR_COLUMNS, DedupResult, prepare_stage
from sift_kg_spark.tableio import StageStore


def run_dedup_incremental(
    spark: SparkSession,
    new_pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    base_workdir: str | None = None,
    workdir: str | None = None,
    resume: bool = True,
    base_tables: dict[str, DataFrame] | None = None,
) -> DedupResult:
    """Dedup an append batch against a completed base run.

    ``base_workdir``: snapshot dir of the base :func:`run_dedup` run
    (read-only here). Alternatively ``base_tables`` supplies the base
    state directly as DataFrames {"prepared", "features", "assignments"}
    — the streaming wrapper uses this to present a UNION of per-batch
    generation tables without ever rewriting them. ``workdir``: snapshot
    dir for this increment's own stages. Returns a :class:`DedupResult`
    whose ``assignments`` / ``clusters`` cover the COMBINED corpus
    (base + batch) and whose ``dup_pairs`` / ``review_pairs`` carry only
    the new evidence.
    """
    if base_tables is not None:
        base_prepared = base_tables["prepared"]
        base_features = base_tables["features"]
        base_assign = base_tables["assignments"]
    else:
        if base_workdir is None:
            raise ValueError(
                "run_dedup_incremental requires base_workdir or base_tables"
            )
        base = StageStore(spark, base_workdir, context=asdict(cfg))
        for required in ("prepared", "features", "assignments"):
            if not base.exists(required):
                raise ValueError(
                    f"base run at {base_workdir} lacks committed stage "
                    f"'{required}' (or was produced under a different config)"
                )
        base_prepared = base.read("prepared")
        base_features = base.read("features")
        base_assign = base.read("assignments")

    store = (
        StageStore(
            spark, workdir, context={**asdict(cfg), "base": base_workdir}
        )
        if workdir
        else None
    )

    def commit(name: str, build, inputs: tuple[str, ...] = ()) -> DataFrame:
        if store is None:
            from pyspark import StorageLevel

            return build().persist(StorageLevel.MEMORY_AND_DISK)
        return store.stage(name, build, inputs=inputs, resume=resume)

    n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # ---- 1. prepare + base-collision rescue --------------------------------
    def build_prepared() -> DataFrame:
        inc = prepare_stage(new_pages, cfg, n_partitions)
        # Idempotent re-delivery: urls already in the base corpus are not
        # re-deduped (the base decision stands).
        inc = inc.join(
            base_prepared.select("url"), "url", "leftanti"
        )
        # uid uniqueness must hold across base ∪ batch: within-batch
        # collisions were rescued inside prepare_stage; cross-base ones
        # re-key here (slim int64 semi-join against the base uid column).
        base_uids = base_prepared.select("doc_uid").withColumn(
            "_in_base", F.lit(True)
        )
        return (
            inc.join(base_uids, "doc_uid", "left")
            .withColumn(
                "doc_uid",
                F.when(
                    F.col("_in_base").isNotNull(),
                    F.xxhash64("url", F.lit("#uid-rekey-base")),
                ).otherwise(F.col("doc_uid")),
            )
            .drop("_in_base")
        )

    prepared = commit("prepared", build_prepared, ("pages",))
    docs = prepared.filter(F.col("reason").isNull()).drop("reason")
    quarantine = prepared.filter(F.col("reason").isNotNull()).select(
        "url", "lang", "reason"
    )

    # ---- 2. exact: within-batch stars + cross-base attachment --------------
    group_cols = ["sha", "lang"] if cfg.partition_by_lang else ["sha"]

    def build_exact() -> DataFrame:
        within = exact_dup_pairs(docs, cfg)
        new_shas = docs.select(*group_cols).distinct()
        base_reps = (
            base_prepared.filter(F.col("reason").isNull())
            .join(new_shas, on=group_cols, how="leftsemi")
            .groupBy(*group_cols)
            .agg(F.min("url").alias("rep_url"))
        )
        cross = (
            docs.select("url", *group_cols)
            .join(base_reps, on=group_cols, how="inner")
            .select(
                F.col("url").alias("url_a"),
                F.col("rep_url").alias("url_b"),
                F.lit("exact").alias("channel"),
                F.lit(1.0).alias("jaccard"),
            )
        )
        return within.unionByName(cross)

    exact_pairs = commit("exact_pairs", build_exact, ("prepared",))

    # ---- 3. signatures for genuinely new texts only ------------------------
    features_udf = make_features_udf(cfg)

    def build_features() -> DataFrame:
        # One representative per NEW distinct sha — "seen in base" means a
        # NON-quarantined base row carries it: a sha whose only base
        # occurrences were quarantined has no base signature and no base
        # cluster to attach to, so the new doc must be featured itself
        # (full-run parity for the raw-short/normalized-same edge case).
        new_only = docs.join(
            base_prepared.filter(F.col("reason").isNull())
            .select(*group_cols)
            .distinct(),
            on=group_cols,
            how="leftanti",
        )
        reps = (
            new_only.groupBy(*group_cols)
            .agg(F.min_by(F.struct(*new_only.columns), F.col("url")).alias("_r"))
            .select("_r.*")
        )
        return reps.select(
            "doc_uid", "url", "lang", "n_chars",
            features_udf(F.col("text_norm")).alias("f"),
        ).select(
            "doc_uid", "url", "lang", "n_chars",
            "f.n_tokens", "f.shingles", "f.simhash", "f.keys",
        )

    features = commit("features", build_features, ("prepared",))

    # ---- 4. candidates over buckets touched by new keys --------------------
    def build_candidates() -> DataFrame:
        new_keys = explode_keys(features, cfg).withColumn("is_new", F.lit(True))
        old_keys = explode_keys(
            base_features.select("doc_uid", "lang", "keys"), cfg
        ).withColumn("is_new", F.lit(False))
        return candidate_pairs_incremental(
            new_keys.unionByName(old_keys), cfg
        )

    candidates = commit("candidates", build_candidates, ("features",))

    feat_cols = ["doc_uid", "shingles", "simhash"]
    features_all = features.select(*feat_cols).unionByName(
        base_features.select(*feat_cols)
    )

    verified = commit(
        "verified",
        lambda: verify_pairs(candidates, features_all, cfg),
        ("candidates", "features"),
    )

    # ---- 5. suffix confirm on the still-flagged gray zone ------------------
    texts_all = docs.select("doc_uid", "text_norm").unionByName(
        base_prepared.filter(F.col("reason").isNull()).select(
            "doc_uid", "text_norm"
        )
    )

    def build_spans() -> DataFrame:
        flagged = verified.filter(F.col("status") == "flagged").select(
            "uid_a", "uid_b"
        )
        flagged_texts = (
            flagged.join(
                texts_all.select(
                    F.col("doc_uid").alias("uid_a"),
                    F.col("text_norm").alias("text_a"),
                ),
                "uid_a",
            ).join(
                texts_all.select(
                    F.col("doc_uid").alias("uid_b"),
                    F.col("text_norm").alias("text_b"),
                ),
                "uid_b",
            )
        ).select("uid_a", "uid_b", "text_a", "text_b")
        return confirm_spans(flagged_texts.repartition(n_partitions), cfg)

    spans = commit("spans", build_spans, ("verified", "prepared"))

    # ---- 6. new evidence table (url-named) ---------------------------------
    urls_all = docs.select("doc_uid", "url").unionByName(
        base_prepared.select("doc_uid", "url")
    )

    def build_pairs() -> DataFrame:
        scored = verified.join(spans, ["uid_a", "uid_b"], "left")
        span_confirm = (F.col("status") == "flagged") & (
            F.col("span") >= cfg.min_span_bytes
        )
        upgraded = scored.withColumn(
            "decided_by",
            F.when(span_confirm, F.lit("suffix")).otherwise(F.col("decided_by")),
        ).withColumn(
            "status",
            F.when(span_confirm, F.lit("confirmed")).otherwise(F.col("status")),
        )
        named = (
            upgraded.join(
                urls_all.select(
                    F.col("doc_uid").alias("uid_a"), F.col("url").alias("_ua")
                ),
                "uid_a",
            )
            .join(
                urls_all.select(
                    F.col("doc_uid").alias("uid_b"), F.col("url").alias("_ub")
                ),
                "uid_b",
            )
            .withColumn("url_a", F.least("_ua", "_ub"))
            .withColumn("url_b", F.greatest("_ua", "_ub"))
        )
        exact = (
            exact_pairs.withColumn("n_keys", F.lit(None).cast("bigint"))
            .withColumn("hamming", F.lit(0))
            .withColumn("span", F.lit(None).cast("int"))
            .withColumn("status", F.lit("confirmed"))
            .withColumn("decided_by", F.lit("exact"))
        )
        return exact.select(*PAIR_COLUMNS).unionByName(
            named.select(*PAIR_COLUMNS)
        )

    dup_pairs = commit("dup_pairs", build_pairs, ("verified", "spans", "exact_pairs"))
    review_pairs = dup_pairs.filter(F.col("status") == "flagged")

    # ---- 7. contracted clustering ------------------------------------------
    def build_assignments() -> DataFrame:
        edges = dup_pairs.filter(F.col("status") == "confirmed").select(
            "url_a", "url_b"
        )
        # contract base clusters to their cluster_id supernode (the label
        # IS the cluster's min url, so min-label CC composes globally)
        node_of = base_assign.select("url", F.col("cluster_id").alias("node"))
        contracted = (
            edges.join(
                node_of.withColumnRenamed("url", "url_a").withColumnRenamed(
                    "node", "_na"
                ),
                "url_a",
                "left",
            )
            .join(
                node_of.withColumnRenamed("url", "url_b").withColumnRenamed(
                    "node", "_nb"
                ),
                "url_b",
                "left",
            )
            .select(
                F.coalesce("_na", "url_a").alias("url_a"),
                F.coalesce("_nb", "url_b").alias("url_b"),
            )
            .filter(F.col("url_a") != F.col("url_b"))
        )
        merged = connected_components(contracted, cfg.max_cc_iterations)
        # merged: (url=supernode-or-new-url, cluster_id=new label)

        # members of every affected cluster, with n_chars for the A1 rule
        base_members = (
            base_assign.join(
                merged.select(
                    F.col("url").alias("cluster_id"),
                    F.col("cluster_id").alias("_label"),
                ),
                "cluster_id",
            )
            .join(base_prepared.select("url", "n_chars"), "url")
            .select("url", F.col("_label").alias("cluster_id"), "n_chars")
        )
        new_members = (
            docs.select("url", "n_chars")
            .join(merged.withColumnRenamed("cluster_id", "_label"), "url", "left")
            .select(
                "url",
                F.coalesce("_label", F.col("url")).alias("cluster_id"),
                "n_chars",
            )
        )
        affected = base_members.unionByName(new_members)
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("n_chars"), F.asc("url")
        )
        wsize = Window.partitionBy("cluster_id")
        recomputed = (
            affected.withColumn("canonical_url", F.first("url").over(w))
            .withColumn("cluster_size", F.count("*").over(wsize))
            .select("url", "cluster_id", "canonical_url", "cluster_size")
        )
        untouched = base_assign.join(
            merged.select(F.col("url").alias("cluster_id")),
            "cluster_id",
            "leftanti",
        ).select("url", "cluster_id", "canonical_url", "cluster_size")
        return untouched.unionByName(recomputed)

    assignments = commit(
        "assignments", build_assignments, ("dup_pairs", "prepared")
    )

    def build_clusters() -> DataFrame:
        return assignments.groupBy("cluster_id").agg(
            F.count("*").alias("size"),
            F.min("canonical_url").alias("canonical_url"),
        )

    clusters = commit("clusters", build_clusters, ("assignments",))

    return DedupResult(
        docs=docs,
        quarantine=quarantine,
        dup_pairs=dup_pairs,
        review_pairs=review_pairs,
        assignments=assignments,
        clusters=clusters,
        store=store,
    )
