"""Incremental (append-batch) dedup: new pages join an existing corpus.

The reference re-runs its resolve loop over the whole graph whenever new
documents arrive (/root/reference/src/sift_kg/resolve/engine.py:11-137 —
iterative full-graph passes). At crawl scale that is untenable: a daily
batch must cost O(batch), not O(corpus). This module implements the
append workflow against a completed base run's snapshot directory:

  1. prepare the new batch (same extraction/normalization/quarantine);
     re-key any doc_uid colliding with the base corpus;
  2. exact stage: new shas join base representatives; star edges within
     new-only sha groups;
  3. signatures computed ONLY for new distinct texts — base signatures
     are read back from the base feature snapshot, never recomputed;
  4. candidate generation reads the base run's committed exploded-key
     snapshot (pipeline "keys" stage) and semi-joins it against the
     batch's distinct keys — only buckets touched by >= 1 new key enter
     the exchange, so base-side SHUFFLE volume is O(touched buckets), not
     O(corpus keys), and base features are never re-exploded
     (operators/lsh.candidate_pairs_incremental pairs them);
  5. verify/suffix on the new pairs only; the base-side feature/text/url
     lookups are all (broadcast batch-uid-set) semi-joins against the base
     snapshots — narrow columnar scans, zero base-side shuffles;
  6. clustering by CONTRACTION: base clusters enter the component graph
     as single supernodes (their cluster_id IS their min-url label), new
     confirmed edges connect supernodes and new docs, and connected
     components runs over this contracted graph — orders of magnitude
     smaller than the corpus. Untouched base clusters are carried over
     without rewriting; only merged clusters recompute the A1 canonical.

Cost model per batch: every base-side access is either a broadcast
semi/anti join (narrow scan, no exchange) or a broadcast hash join whose
build side is batch-derived; the only remaining O(corpus) cost is the
narrow columnar base scans themselves (an Iceberg/bloom-filter index is
the seam that would prune those too). Assignments are committed as a
DELTA (``assignments_delta``: every member of every cluster the batch
touched, plus all new docs, each row carrying ``prev_cluster_id``) —
O(touched clusters), not O(corpus); the COMBINED view is derived lazily
from base ∪ delta and only materialized on request
(``materialize_assignments``). At the Iceberg seam the delta is exactly
a MERGE INTO payload (delete prev_cluster_id groups, insert new rows).

Equivalence contract: per-pair decisions are identical to the full run
(same deterministic scores/thresholds); the final partition equals the
full run on the combined corpus whenever candidate coverage does (planted
-class equivalence is pinned by tests/test_incremental.py). cluster_id =
min member url and the A1 canonical rule hold globally because min-label
contraction composes: min(min(A), min(B)) = min(A ∪ B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sift_kg_spark.config import DEFAULT_CONFIG, DedupConfig
from sift_kg_spark.functions.features import (
    FEATURE_BASE_DTYPES,
    make_features_udf,
)
from sift_kg_spark.operators.components import connected_components
from sift_kg_spark.operators.exact import exact_dup_pairs
from sift_kg_spark.operators.lsh import candidate_pairs_incremental, explode_keys
from sift_kg_spark.operators.suffix import confirm_spans
from sift_kg_spark.operators.verify import verify_pairs
from sift_kg_spark.pipeline import (
    PAIR_COLUMNS,
    DedupResult,
    prepare_stage,
    run_context,
)
from sift_kg_spark.tableio import StageStore


def check_base_features_schema(base_features: DataFrame) -> None:
    """Reject a base feature snapshot written under another format.

    StageStore's context fingerprint (pipeline.run_context) already
    rejects cross-version bases at the manifest level; this direct check
    also covers the ``base_tables`` path and hand-assembled bases. Without
    it Spark would coerce e.g. an int64-shingle base union to
    array<bigint> and every cross-generation Jaccard would compute ~0 —
    silent recall loss.
    """
    actual = dict(base_features.dtypes)
    for col, want in FEATURE_BASE_DTYPES.items():
        got = actual.get(col)
        if got != want:
            raise ValueError(
                f"base feature snapshot column '{col}' has type {got!r}, "
                f"current format requires {want!r} — the base was produced "
                "under an incompatible feature format; re-run the base "
                "pipeline (or migrate the snapshot) before appending"
            )


def incremental_candidates(
    new_keys: DataFrame, base_keys: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Candidate pairs for an append batch, base side pruned BY KEY.

    ``new_keys``/``base_keys``: (doc_uid, lang, key) exploded key tables
    (pipeline "keys" stage shape). The batch's distinct key set is
    broadcast against the base key snapshot, so only base keys landing in
    a bucket the batch touches ever enter the pairing exchange — the
    base-side shuffle is O(touched), not O(corpus). The base FEATURE
    table is never read here at all.

    Broadcast sizing: the probe set is ~44 distinct int64 keys per batch
    doc (~1 MB per 3k docs) — far under the 8 GB broadcast ceiling for
    any sane micro-batch; a backfill large enough to breach it should run
    as a fresh base build (run_dedup), which is cheaper than incremental
    at that size anyway.
    """
    key_cols = ["lang", "key"] if cfg.partition_by_lang else ["key"]
    tagged_new = new_keys.withColumn("is_new", F.lit(True))
    new_key_set = new_keys.select(*key_cols).distinct()
    touched = base_keys.join(
        F.broadcast(new_key_set), on=key_cols, how="leftsemi"
    ).withColumn("is_new", F.lit(False))
    return candidate_pairs_incremental(
        tagged_new.unionByName(touched), cfg
    )


def run_dedup_incremental(
    spark: SparkSession,
    new_pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    base_workdir: str | None = None,
    workdir: str | None = None,
    resume: bool = True,
    base_tables: dict[str, DataFrame] | None = None,
    materialize_assignments: bool = True,
) -> DedupResult:
    """Dedup an append batch against a completed base run.

    ``base_workdir``: snapshot dir of the base :func:`run_dedup` run
    (read-only here). Alternatively ``base_tables`` supplies the base
    state directly as DataFrames {"prepared", "features", "assignments"}
    and optionally {"keys"} — the streaming wrapper uses this to present
    a UNION of per-batch generation tables without ever rewriting them.
    ``workdir``: snapshot dir for this increment's own stages. Returns a
    :class:`DedupResult` whose ``assignments`` / ``clusters`` cover the
    COMBINED corpus (base + batch) and whose ``dup_pairs`` /
    ``review_pairs`` carry only the new evidence.

    ``materialize_assignments``: when True (default, the one-shot append
    workflow) the combined assignments/clusters tables are committed to
    ``workdir`` like every other stage. When False (the streaming
    wrapper) only the O(touched-clusters) ``assignments_delta`` stage is
    written; the returned combined tables are lazy views over
    base ∪ delta, and the per-generation write volume is bounded by the
    batch's blast radius instead of the corpus.
    """
    # Corpus-STATEFUL prepare tiers cannot run batch-locally: span dedup
    # counts chunk occurrences over the whole corpus and capture dedup
    # picks the latest capture per canonical URL over all captures — a
    # batch-scoped application diverges from the full-run result the
    # incremental contract promises (combined == full, row for row).
    # Supporting them incrementally needs a chunk-count / canonical-
    # capture snapshot maintained alongside `keys` (the same Iceberg
    # seam); until then, fail loudly instead of silently diverging.
    # quality_gate is per-doc (no corpus state) and composes fine.
    if cfg.span_dedup or cfg.capture_dedup:
        raise ValueError(
            "span_dedup/capture_dedup are corpus-stateful prepare tiers "
            "and are not supported in incremental mode: applying them "
            "per batch would diverge from a full run over the combined "
            "corpus. Run them in the full (batch) pipeline, or disable "
            "them for incremental appends."
        )
    base_keys: DataFrame | None = None
    if base_tables is not None:
        base_prepared = base_tables["prepared"]
        base_features = base_tables["features"]
        base_assign = base_tables["assignments"]
        base_keys = base_tables.get("keys")
    else:
        if base_workdir is None:
            raise ValueError(
                "run_dedup_incremental requires base_workdir or base_tables"
            )
        base = StageStore(spark, base_workdir, context=run_context(cfg))
        for required in ("prepared", "features", "assignments"):
            if not base.exists(required):
                raise ValueError(
                    f"base run at {base_workdir} lacks committed stage "
                    f"'{required}' (or was produced under a different config)"
                )
        base_prepared = base.read("prepared")
        base_features = base.read("features")
        base_assign = base.read("assignments")
        if base.exists("keys"):
            base_keys = base.read("keys")
    check_base_features_schema(base_features)
    if base_keys is None:
        # pre-"keys"-stage base (or hand-assembled base_tables): derive the
        # key table once from the base features — the one path that still
        # re-explodes the base; committed bases never take it.
        base_keys = explode_keys(
            base_features.select("doc_uid", "lang", "keys"), cfg
        )

    store = (
        StageStore(
            spark, workdir, context={**run_context(cfg), "base": base_workdir}
        )
        if workdir
        else None
    )

    def commit(name: str, build, inputs: tuple[str, ...] = ()) -> DataFrame:
        if store is None:
            # localCheckpoint (lazy), not bare persist: the increment's
            # stages reference base/batch subtrees many times over
            # (broadcast uid/key/url sets), and without per-stage PLAN
            # truncation Catalyst re-analyzes the exponentially nested
            # lineage on every downstream Dataset build — minutes of
            # driver time before any job runs. Blocks are stored
            # MEMORY_AND_DISK either way; a workdir store gets the same
            # truncation from its parquet round-trip.
            return build().localCheckpoint(eager=False)
        return store.stage(name, build, inputs=inputs, resume=resume)

    n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    group_cols = ["sha", "lang"] if cfg.partition_by_lang else ["sha"]
    base_docs = base_prepared.filter(F.col("reason").isNull())

    # ---- 1. prepare + base-collision rescue --------------------------------
    def build_prepared() -> DataFrame:
        # checkpoint the extracted batch once: it feeds the main plan plus
        # two broadcast probe sets below, and the pandas-UDF extraction
        # chain should run once per batch, not once per reference.
        inc = prepare_stage(new_pages, cfg, n_partitions).localCheckpoint(
            eager=False
        )
        # Idempotent re-delivery: urls already in the base corpus are not
        # re-deduped (the base decision stands). The redelivered set is
        # found by streaming the base url column against the BROADCAST
        # batch url set (narrow base scan, no exchange), then anti-joining
        # the tiny hit set back — the batch side is small by definition;
        # the base side never shuffles.
        url_hits = base_prepared.select("url").join(
            F.broadcast(inc.select("url").distinct()), "url", "leftsemi"
        )
        inc = inc.join(F.broadcast(url_hits), "url", "leftanti")
        # uid uniqueness must hold across base ∪ batch: within-batch
        # collisions were rescued inside prepare_stage; cross-base ones
        # re-key here. Same pattern: narrow base uid scan vs broadcast
        # batch uid set -> tiny collision table -> broadcast back.
        uid_hits = (
            base_prepared.select("doc_uid")
            .join(
                F.broadcast(inc.select("doc_uid").distinct()),
                "doc_uid",
                "leftsemi",
            )
            .withColumn("_in_base", F.lit(True))
        )
        return (
            inc.join(F.broadcast(uid_hits), "doc_uid", "left")
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
    def build_exact() -> DataFrame:
        within = exact_dup_pairs(docs, cfg)
        new_shas = docs.select(*group_cols).distinct()
        base_reps = (
            base_docs.join(F.broadcast(new_shas), on=group_cols, how="leftsemi")
            .groupBy(*group_cols)
            .agg(F.min("url").alias("rep_url"))
        )
        cross = (
            docs.select("url", *group_cols)
            .join(F.broadcast(base_reps), on=group_cols, how="inner")
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
        # Base shas intersecting the batch are found narrowly (broadcast
        # batch-sha set), then anti-joined back — the base sha column is
        # scanned once, never shuffled.
        batch_shas = docs.select(*group_cols).distinct()
        base_sha_hits = (
            base_docs.select(*group_cols)
            .join(F.broadcast(batch_shas), on=group_cols, how="leftsemi")
            .distinct()
        )
        new_only = docs.join(
            F.broadcast(base_sha_hits), on=group_cols, how="leftanti"
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

    # batch-only key snapshot: committed so chained increments (streaming
    # generations) semi-join it instead of re-exploding this batch later.
    keys_new = commit(
        "keys", lambda: explode_keys(features, cfg), ("features",)
    )

    # ---- 4. candidates over buckets touched by new keys --------------------
    candidates = commit(
        "candidates",
        lambda: incremental_candidates(keys_new, base_keys, cfg),
        ("keys",),
    )

    # ---- 5. verify + suffix: base lookups pruned to candidate uids ---------
    feat_cols = ["doc_uid", "shingles", "simhash"]

    def build_verified() -> DataFrame:
        cand_uids = (
            candidates.select(F.col("uid_a").alias("doc_uid"))
            .unionByName(candidates.select(F.col("uid_b").alias("doc_uid")))
            .distinct()
        )
        base_needed = base_features.select(*feat_cols).join(
            F.broadcast(cand_uids), "doc_uid", "leftsemi"
        )
        features_all = features.select(*feat_cols).unionByName(base_needed)
        return verify_pairs(candidates, features_all, cfg)

    verified = commit(
        "verified", build_verified, ("candidates", "features")
    )

    def build_spans() -> DataFrame:
        flagged = verified.filter(F.col("status") == "flagged").select(
            "uid_a", "uid_b"
        )
        f_uids = (
            flagged.select(F.col("uid_a").alias("doc_uid"))
            .unionByName(flagged.select(F.col("uid_b").alias("doc_uid")))
            .distinct()
        )
        base_texts = base_docs.select("doc_uid", "text_norm").join(
            F.broadcast(f_uids), "doc_uid", "leftsemi"
        )
        texts_all = docs.select("doc_uid", "text_norm").unionByName(base_texts)
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
        v_uids = (
            verified.select(F.col("uid_a").alias("doc_uid"))
            .unionByName(verified.select(F.col("uid_b").alias("doc_uid")))
            .distinct()
        )
        base_urls = base_prepared.select("doc_uid", "url").join(
            F.broadcast(v_uids), "doc_uid", "leftsemi"
        )
        urls_all = docs.select("doc_uid", "url").unionByName(base_urls)
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
    def build_assignments_delta() -> DataFrame:
        edges = dup_pairs.filter(F.col("status") == "confirmed").select(
            "url_a", "url_b"
        )
        # contract base clusters to their cluster_id supernode (the label
        # IS the cluster's min url, so min-label CC composes globally).
        # Only urls that appear in a new edge need their supernode lookup:
        # prune the assignment map to the (tiny) edge-url set first, then
        # broadcast it into the left joins — the base assignment table is
        # scanned narrowly, never shuffled.
        edge_urls = (
            edges.select(F.col("url_a").alias("url"))
            .unionByName(edges.select(F.col("url_b").alias("url")))
            .distinct()
        )
        node_of = base_assign.select(
            "url", F.col("cluster_id").alias("node")
        ).join(F.broadcast(edge_urls), "url", "leftsemi")
        contracted = (
            edges.join(
                F.broadcast(
                    node_of.withColumnRenamed("url", "url_a").withColumnRenamed(
                        "node", "_na"
                    )
                ),
                "url_a",
                "left",
            )
            .join(
                F.broadcast(
                    node_of.withColumnRenamed("url", "url_b").withColumnRenamed(
                        "node", "_nb"
                    )
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

        # members of every affected cluster, with n_chars for the A1 rule.
        # ``merged`` is batch-scale: broadcast it against the base tables.
        affected_base = base_assign.join(
            F.broadcast(
                merged.select(
                    F.col("url").alias("cluster_id"),
                    F.col("cluster_id").alias("_label"),
                )
            ),
            "cluster_id",
        ).select("url", F.col("cluster_id").alias("prev_cluster_id"), "_label")
        # affected_base is CLUSTER-scale (the full membership of every
        # base cluster a new edge touched), NOT batch-scale: one new doc
        # merging into a giant boilerplate cluster makes it that cluster's
        # size. No broadcast hint here — AQE broadcasts it only when the
        # measured build side is actually small (r3 ADVICE).
        base_members = base_prepared.select("url", "n_chars").join(
            affected_base, "url"
        ).select(
            "url", F.col("_label").alias("cluster_id"), "n_chars",
            "prev_cluster_id",
        )
        new_members = (
            docs.select("url", "n_chars")
            .join(
                F.broadcast(merged.withColumnRenamed("cluster_id", "_label")),
                "url",
                "left",
            )
            .select(
                "url",
                F.coalesce("_label", F.col("url")).alias("cluster_id"),
                "n_chars",
                F.lit(None).cast("string").alias("prev_cluster_id"),
            )
        )
        affected = base_members.unionByName(new_members)
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("n_chars"), F.asc("url")
        )
        wsize = Window.partitionBy("cluster_id")
        return (
            affected.withColumn("canonical_url", F.first("url").over(w))
            .withColumn("cluster_size", F.count("*").over(wsize))
            .select(
                "url", "cluster_id", "canonical_url", "cluster_size",
                "prev_cluster_id",
            )
        )

    # The per-generation WRITE: every member of every touched cluster plus
    # all new docs — O(batch blast radius), never O(corpus). prev_cluster_id
    # (null for new docs) is the delete key an Iceberg MERGE INTO would use.
    assignments_delta = commit(
        "assignments_delta", build_assignments_delta, ("dup_pairs", "prepared")
    )

    def build_assignments() -> DataFrame:
        # touched base cluster ids: one row per merged cluster — batch-
        # scale by construction (bounded by the number of new edges), so
        # the anti-join probe set broadcasts safely where the full delta
        # membership might not.
        touched = (
            assignments_delta.select(
                F.col("prev_cluster_id").alias("cluster_id")
            )
            .filter(F.col("cluster_id").isNotNull())
            .distinct()
        )
        untouched = base_assign.join(
            F.broadcast(touched), "cluster_id", "leftanti"
        ).select("url", "cluster_id", "canonical_url", "cluster_size")
        return untouched.unionByName(
            assignments_delta.select(
                "url", "cluster_id", "canonical_url", "cluster_size"
            )
        )

    if materialize_assignments:
        assignments = commit(
            "assignments", build_assignments, ("assignments_delta",)
        )
    else:
        assignments = build_assignments().localCheckpoint(eager=False)

    def build_clusters() -> DataFrame:
        return assignments.groupBy("cluster_id").agg(
            F.count("*").alias("size"),
            F.min("canonical_url").alias("canonical_url"),
        )

    if materialize_assignments:
        clusters = commit("clusters", build_clusters, ("assignments",))
    else:
        clusters = build_clusters().localCheckpoint(eager=False)

    return DedupResult(
        docs=docs,
        quarantine=quarantine,
        dup_pairs=dup_pairs,
        review_pairs=review_pairs,
        assignments=assignments,
        clusters=clusters,
        store=store,
    )
