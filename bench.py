"""Benchmark harness — one JSON line to stdout.

Headline: wall-clock of the full near-duplicate pipeline (extract ->
normalize -> exact -> MinHash/LSH -> verify -> suffix -> connected
components) over the deterministic synthetic webtext corpus at the given
scale factor, plus per-query timings of representative operators over the
driver testdata tables.

Env:
  SPARK_GRAFT_SF_DIR  driver testdata dir (default /root/testdata/sf0.1);
                      the trailing sfX.Y also sets the webtext corpus size
                      (n_pages = 1_000_000 * sf, i.e. sf0.1 -> 100k pages)
  SPARK_GRAFT_CPUS    cores for local[N] (default 32)
  SPARK_GRAFT_BENCH_RUNS  headline repetitions, best-of-N (default 2).
                      This host's wall-clock drifts >2x between sessions
                      (BENCH/AB_r03.md); N >= 2 damps a drift spike landing
                      inside the single timed region. Run 2+ also measures
                      the warm-executor state a long-lived cluster runs in
                      (JVM JIT'd, Python workers spawned); each run still
                      recomputes the full pipeline from the parquet scan
                      (results unpersisted between runs).

The webtext corpus is generated once (seed 42) and cached under
data/webtext_sf{sf}; scaling-efficiency evidence (same job at local[8] vs
local[32]) is produced by scripts/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "dedup_full_pipeline",
    "dedup_lsh_candidates",
    "ngram_jaccard_pairs",
    "winnow_dup_pairs",
    "embedding_cosine_topk",
    "ann_lsh_topk_embeddings",
    "ann_ivf_topk_embeddings",
    "multimodal_ann_twins",
    "line_dedup_clean",
    "cluster_pair_stats",
    "tpch_q1_pricing",
    "region_revenue",
    "top3_customers_per_nation",
    "sessionize_events",
    "cc_chain_components",
    # round-5 training-data ops
    "decontaminate_benchmark",
    "pii_redaction_stats",
    "token_budget_mix",
    "simhash_near_dups",
]


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)\/?$", sf_dir)
    return float(m.group(1)) if m else 0.1


def ensure_corpus(sf: float, repo_root: str) -> str:
    n_pages = max(1000, int(1_000_000 * sf))
    outdir = os.path.join(repo_root, "data", f"webtext_sf{sf}")
    marker = os.path.join(outdir, "pages.parquet")
    if not os.path.exists(marker):
        from sift_kg_spark.fixtures import write_corpus

        write_corpus(outdir, n_pages, seed=42)
    return outdir


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    repo_root = os.path.dirname(os.path.abspath(__file__))

    corpus_dir = ensure_corpus(sf, repo_root)

    from sift_kg_spark import DedupConfig, get_spark
    from sift_kg_spark.pipeline import run_dedup

    spark = get_spark(
        app_name=f"bench_sf{sf}", cores=cpus, shuffle_partitions=max(cpus, 8)
    )

    # --- headline: dedup pipeline over the webtext corpus, best-of-N ---
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    n_docs = pages.count()  # warm the scan; excluded from the timed region
    run_secs: list[float] = []
    n_assigned = n_clusters = 0
    for _ in range(n_runs):
        t0 = time.monotonic()
        res = run_dedup(spark, pages, DedupConfig())
        n_assigned = res.assignments.count()
        n_clusters = res.clusters.count()
        run_secs.append(time.monotonic() - t0)
        # Drop EVERY cached stage, not just the result handles: without
        # this, the next run's identical logical plans hit the
        # CacheManager and "best-of-N" silently measures a warm-cache
        # replay (observed 145 s -> 23 s), not a fresh pipeline.
        spark.catalog.clearCache()
    pipeline_sec = min(run_secs)

    # --- per-query timings over the driver testdata tables ---
    # Best-of-N per QUERY too, not just the headline: this host's
    # wall-clock drifts >2x between sessions (BENCH/AB_r03.md), and the
    # r4 single-shot loop recorded 8-17x phantom "regressions" when one
    # drift spike landed inside a timed query (adjudicated non-reproducing
    # in VERDICT r4). Both runs are recorded per query so drift is
    # readable off this file alone.
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    query_secs: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.count()
            runs.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()  # same fresh-plan rule as headline
        query_secs[name] = min(runs)
        query_runs[name] = runs

    out = {
        "metric": "dedup_pipeline_wall_sec",
        "value": round(pipeline_sec, 2),
        "unit": "sec",
        "docs": n_docs,
        "docs_per_sec": round(n_docs / pipeline_sec, 1),
        "clusters": n_clusters,
        "duplicate_rows_removed": n_assigned - n_clusters,
        "cpus": cpus,
        "runs_sec": [round(s, 2) for s in run_secs],
        "queries": query_secs,
        "query_runs_sec": query_runs,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
