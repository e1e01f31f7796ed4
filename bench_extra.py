"""Round-6 measurement harness (guide §1) — NOT the frozen bench.py.

Three sub-commands:

  stages  — per-stage wall clock of the dedup pipeline over the webtext
            corpus (same corpus/config as bench.py's headline), each stage
            forced through the noop sink so the computation is timed, not
            the sink, and labelled via setJobDescription.
  queries — noop-sink wall clock of selected declared queries over the
            driver testdata tables (same clearCache discipline as
            bench.py), best-of-N.
  plans   — dump .explain("formatted") of selected queries to
            plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py stages  [sf]
  python bench_extra.py queries [sf] q1 q2 ...
  python bench_extra.py plans   <tag> [sf] q1 q2 ...

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES, _sf_from_dir, ensure_corpus  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _spark(sf):
    from sift_kg_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(
        app_name=f"bench_extra_sf{sf}", cores=cpus,
        shuffle_partitions=max(cpus, 8),
    )


def cmd_stages(sf_dir: str) -> None:
    sf = _sf_from_dir(sf_dir)
    repo_root = os.path.dirname(os.path.abspath(__file__))
    corpus_dir = ensure_corpus(sf, repo_root)
    spark = _spark(sf)

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from sift_kg_spark import DedupConfig
    from sift_kg_spark.operators.exact import (
        exact_dup_pairs,
        exact_representatives,
    )
    from sift_kg_spark.operators.lsh import candidate_pairs, explode_keys
    from sift_kg_spark.operators.suffix import confirm_spans
    from sift_kg_spark.operators.verify import verify_pairs
    from sift_kg_spark.pipeline import (
        PAIR_COLUMNS,
        prepare_stage,
    )
    from sift_kg_spark.functions.features import make_features_udf
    from sift_kg_spark.operators.components import connected_components

    cfg = DedupConfig()
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    pages.count()  # warm scan

    n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    timings: dict[str, float] = {}

    def stage(name, build, persist=True):
        spark.sparkContext.setJobDescription(f"r6-stage: {name}")
        t0 = time.monotonic()
        df = build()
        if persist:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
        _noop(df)
        timings[name] = round(time.monotonic() - t0, 2)
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: {timings[name]} s", file=sys.stderr)
        return df

    t_all0 = time.monotonic()
    prepared = stage(
        "prepare", lambda: prepare_stage(pages, cfg, n_partitions)
    )
    docs = prepared.filter(F.col("reason").isNull()).drop("reason")
    exact_pairs = stage("exact_pairs", lambda: exact_dup_pairs(docs, cfg))
    udf = make_features_udf(cfg)

    def build_features():
        reps = exact_representatives(docs, cfg)
        return reps.select(
            "doc_uid", "url", "lang", "n_chars",
            udf(F.col("text_norm")).alias("f"),
        ).select(
            "doc_uid", "url", "lang", "n_chars",
            "f.n_tokens", "f.shingles", "f.simhash", "f.keys",
        )

    features = stage("features", build_features)
    candidates = stage(
        "candidates", lambda: candidate_pairs(explode_keys(features, cfg), cfg)
    )
    verified = stage("verified", lambda: verify_pairs(candidates, features, cfg))

    def build_spans():
        flagged = verified.filter(F.col("status") == "flagged").select(
            "uid_a", "uid_b"
        )
        texts = docs.select("doc_uid", "text_norm")
        flagged_texts = (
            flagged.join(
                texts.select(
                    F.col("doc_uid").alias("uid_a"),
                    F.col("text_norm").alias("text_a"),
                ),
                "uid_a",
            ).join(
                texts.select(
                    F.col("doc_uid").alias("uid_b"),
                    F.col("text_norm").alias("text_b"),
                ),
                "uid_b",
            )
        ).select("uid_a", "uid_b", "text_a", "text_b")
        return confirm_spans(flagged_texts.repartition(n_partitions), cfg)

    spans = stage("spans", build_spans)

    def build_pairs():
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
        urls = docs.select("doc_uid", "url")
        named = (
            upgraded.join(
                urls.select(
                    F.col("doc_uid").alias("uid_a"), F.col("url").alias("_ua")
                ),
                "uid_a",
            )
            .join(
                urls.select(
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

    dup_pairs = stage("dup_pairs", build_pairs)

    def build_assignments():
        # same shape as pipeline.run_dedup's build_assignments (agg-based
        # canonical pick) so this stage times what the pipeline runs
        edges = dup_pairs.filter(F.col("status") == "confirmed").select(
            "url_a", "url_b"
        )
        cc = connected_components(edges, cfg.max_cc_iterations)
        assigned = docs.select("url", "n_chars").join(cc, "url", "left")
        assigned = assigned.withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("url"))
        )
        canon = assigned.groupBy("cluster_id").agg(
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("_neg_chars"), F.col("url")
                )
            ).alias("_best"),
            F.count("*").alias("cluster_size"),
        ).select(
            "cluster_id",
            F.col("_best.url").alias("canonical_url"),
            "cluster_size",
        )
        return assigned.join(canon, "cluster_id").select(
            "url", "cluster_id", "canonical_url", "cluster_size"
        )

    assignments = stage("assignments", build_assignments)
    stage(
        "clusters",
        lambda: assignments.groupBy("cluster_id").agg(
            F.count("*").alias("size"),
            F.min("canonical_url").alias("canonical_url"),
        ),
        persist=False,
    )
    timings["TOTAL"] = round(time.monotonic() - t_all0, 2)
    print(json.dumps({"mode": "stages", "sf": sf, "timings": timings}))
    spark.stop()


def cmd_queries(sf_dir: str, names: list[str], n_runs: int = 2) -> None:
    sf = _sf_from_dir(sf_dir)
    spark = _spark(sf)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in names or BENCH_QUERIES:
        runs = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"r6-query: {name}")
            t0 = time.monotonic()
            _noop(qs[name](spark, sf_dir))
            runs.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(f"  {name}: {runs}", file=sys.stderr)
    print(json.dumps({"mode": "queries", "sf": sf, "runs": out}))
    spark.stop()


def cmd_plans(tag: str, sf_dir: str, names: list[str], execute: bool = False) -> None:
    sf = _sf_from_dir(sf_dir)
    spark = _spark(sf)
    import __spark_entry__ as entrymod

    repo_root = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(repo_root, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    qs = entrymod.queries()
    for name in names or BENCH_QUERIES:
        df = qs[name](spark, sf_dir)
        if execute:
            # run it so the dumped plan is the FINAL adaptive plan
            # (AQE runtime join rewrites + ReusedExchange visible)
            _noop(df)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        spark.catalog.clearCache()
        print(f"  wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    default_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if mode == "stages":
        cmd_stages(rest[0] if rest else default_dir)
    elif mode == "queries":
        sfd = rest[0] if rest and "/" in rest[0] else default_dir
        names = [r for r in rest if "/" not in r]
        cmd_queries(sfd, names)
    elif mode == "plans":
        tag = rest[0]
        rest = rest[1:]
        execute = "--exec" in rest
        rest = [r for r in rest if r != "--exec"]
        sfd = rest[0] if rest and "/" in rest[0] else default_dir
        names = [r for r in rest if "/" not in r]
        cmd_plans(tag, sfd, names, execute=execute)
    else:
        raise SystemExit(f"unknown mode {mode}")
