"""Scaling-efficiency evidence: the same dedup job at two parallelism
levels on the same input, fresh JVMs each.

The north rule's two-cluster-size criterion (N vs 4N executors) cannot use
a real cluster in this sandbox; per the task brief it is evidenced by the
same job at two parallelism levels. Two modes:

* ``--mode local-cluster`` (default): REAL multi-JVM executors on one box
  — ``local-cluster[2,4,M]`` vs ``local-cluster[8,4,M]`` is structurally
  the N-vs-4N-executor experiment (separate executor JVMs, separate
  pyspark worker pools, shuffles over the block manager), sidestepping the
  single-JVM shared fork pool that round 1 identified as a host artifact
  (BENCH/BASELINE.md).
* ``--mode local``: the round-1 thread-level experiment (local[8] vs
  local[32]) kept for comparison.

Throughput at each level plus

    efficiency = throughput(4N) / (4 * throughput(N)) = T_N / (4 * T_4N)

is written to BENCH/BASELINE.md (target >= 0.8).

Usage:
    python scripts/scaling_bench.py [--sf 0.1] [--runs 2] [--mode local-cluster]
    python scripts/scaling_bench.py --child --master <m> --cores N --pages <path>
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(master: str, cores: int, pages_path: str) -> int:
    from sift_kg_spark import DedupConfig, get_spark
    from sift_kg_spark.pipeline import run_dedup

    extra = {
        # executor JVMs need the package importable in their python workers
        "spark.executorEnv.PYTHONPATH": REPO,
        "spark.executor.memory": os.environ.get("SPARK_GRAFT_EXEC_MEM", "6g"),
    }
    # SAME shuffle partitioning at every level (strong scaling: identical
    # plan + identical per-task work; cores only change how many tasks run
    # at once). Partitions track DATA SIZE, not core count — cores-sized
    # partitions at low parallelism produce multi-hundred-MB blocks that
    # break transport and misrepresent the engine.
    parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "32"))
    spark = get_spark(
        app_name=f"scaling_bench_{cores}",
        master=master,
        shuffle_partitions=parts,
        extra_conf=extra,
    )
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()  # warm the scan
    # Measure the PRODUCTION path: per-stage parquet snapshots + manifests
    # (the north rule's checkpoint/lineage mode). The no-workdir persist
    # chain keeps every intermediate deserialized in executor memory,
    # which at sf >= 0.6 exceeds the heap and thrashes — snapshots also
    # free memory stage by stage, exactly like a real cluster run.
    import shutil
    import tempfile

    # Snapshots on the fast scratch: a real cluster writes stage snapshots
    # to a distributed FS whose bandwidth scales with the fleet; this VM's
    # root disk does ~23 MB/s buffered, which would serialize every level
    # behind one writeback path (see session._local_scratch_dir).
    from sift_kg_spark.session import _local_scratch_dir

    wd = tempfile.mkdtemp(prefix=f"scaling_wd_{cores}_", dir=_local_scratch_dir())
    t0 = time.monotonic()
    res = run_dedup(spark, pages, DedupConfig(), workdir=wd, resume=False)
    res.assignments.count()
    elapsed = time.monotonic() - t0

    # Per-stage wall times from the lineage table the run just wrote:
    # two levels of these decompose each stage into level-invariant F and
    # scalable W via T(c) = F + W/c (the r3 fixed-cost model, per stage).
    stages: dict[str, float] = {}
    try:
        import glob as _glob

        import pandas as pd

        lin = pd.concat(
            pd.read_parquet(p)
            for p in _glob.glob(os.path.join(wd, "_lineage.parquet", "*.parquet"))
        )
        stages = {
            r.stage: float(r.elapsed_sec) for r in lin.itertuples()
        }
    except Exception:
        pass
    shutil.rmtree(wd, ignore_errors=True)
    print(json.dumps({
        "master": master,
        "cores": cores,
        "docs": n_docs,
        "elapsed_sec": round(elapsed, 2),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "stages": stages,
    }))
    spark.stop()
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", type=float, default=0.1)
    p.add_argument("--mode", choices=["local-cluster", "local"],
                   default="local-cluster")
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--exec-cores", type=int, default=4)
    p.add_argument("--exec-mem-mb", type=int, default=7168)
    p.add_argument("--levels", default="2,8",
                   help="executor counts (local-cluster) or core counts (local)")
    p.add_argument("--cooldown", type=int, default=0,
                   help="seconds to sleep between runs (lets the host's "
                        "page-reclaim state settle; its throughput drifts "
                        "2x with recent memory pressure)")
    p.add_argument("--alternate", action="store_true",
                   help="reverse the level order on odd rounds: a fixed "
                        "order always runs the later level in the dirtier "
                        "post-run host window (each run degrades the "
                        "host's page-supply state), biasing its best-of-N "
                        "downward; alternating gives both levels equal "
                        "exposure to fresh and dirty windows")
    p.add_argument("--out", default=os.path.join("BENCH", "SCALING_RUN.md"),
                   help="result file, relative to the repo root")
    p.add_argument("--child", action="store_true")
    p.add_argument("--master")
    p.add_argument("--cores", type=int)
    p.add_argument("--pages")
    args = p.parse_args()

    if args.child:
        return child(args.master, args.cores, args.pages)

    from bench import ensure_corpus

    corpus_dir = ensure_corpus(args.sf, REPO)
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    levels = [int(x) for x in args.levels.split(",")]

    def master_of(level: int) -> tuple[str, int]:
        if args.mode == "local-cluster":
            m = f"local-cluster[{level},{args.exec_cores},{args.exec_mem_mb}]"
            return m, level * args.exec_cores
        return f"local[{level}]", level

    # Interleave levels and keep best-of-N per level: single-host wall
    # times on this VM vary by >2x with host memory state, so alternating
    # runs decorrelate that noise from the parallelism level.
    results: dict[int, dict] = {}
    for run_i in range(args.runs):
        ordered = levels
        if args.alternate and run_i % 2 == 1:
            ordered = list(reversed(levels))
        for level in ordered:
            master, cores = master_of(level)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--master", master, "--cores", str(cores),
                 "--pages", pages_path],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            r = json.loads(line)
            print(json.dumps(r), flush=True)
            if level not in results or r["elapsed_sec"] < results[level]["elapsed_sec"]:
                results[level] = r
            if args.cooldown:
                time.sleep(args.cooldown)

    lo, hi = min(levels), max(levels)
    ratio = results[hi]["cores"] / results[lo]["cores"]
    eff = results[hi]["docs_per_sec"] / (ratio * results[lo]["docs_per_sec"])

    lo_m, hi_m = results[lo]["master"], results[hi]["master"]
    md = f"""# BENCH baseline — measured numbers

Generated by `scripts/scaling_bench.py --mode {args.mode}` on one host
({os.cpu_count()} cores, fresh JVMs per level, same input: synthetic
webtext corpus sf={args.sf}, {results[hi]['docs']} pages, seed 42).

The north rule's N -> 4N executor criterion is evidenced per the task
brief by the same job at two parallelism levels; `{args.mode}` mode uses
{'REAL multi-JVM executors (separate executor processes, block-manager shuffles)' if args.mode == 'local-cluster' else 'thread-level parallelism in one JVM'}.

| level | master | total cores | wall (s) | throughput (docs/sec) |
|---|---|---|---|---|
| N  | {lo_m} | {results[lo]['cores']} | {results[lo]['elapsed_sec']} | {results[lo]['docs_per_sec']} |
| {ratio:.0f}N | {hi_m} | {results[hi]['cores']} | {results[hi]['elapsed_sec']} | {results[hi]['docs_per_sec']} |

**Scaling efficiency** = throughput({ratio:.0f}N) / ({ratio:.0f} x throughput(N))
= **{eff:.3f}** (target >= 0.8).

Pipeline measured: full near-duplicate job (extract -> normalize -> exact
dedup -> MinHash/LSH candidate exchange -> Jaccard/SimHash verify ->
suffix-array confirm -> connected components -> canonical assignment).
"""
    # Per-stage F/W decomposition from the two best runs: T(c) = F + W/c
    # => F = (c_hi*T_hi - c_lo*T_lo) / (c_hi - c_lo), W = c_lo*(T_lo - F).
    st_lo = results[lo].get("stages") or {}
    st_hi = results[hi].get("stages") or {}
    common = [s for s in st_lo if s in st_hi]
    if common:
        c_lo, c_hi = results[lo]["cores"], results[hi]["cores"]
        md += (
            "\n## Per-stage fixed-cost decomposition (best runs)\n\n"
            "T(c) = F + W/c fitted per stage from the two levels; F is the\n"
            "level-invariant cost that caps efficiency.\n\n"
            "| stage | T(N) s | T(4N) s | F s | W core-s | stage eff |\n"
            "|---|---|---|---|---|---|\n"
        )
        tot_f = tot_w = 0.0
        for s in common:
            t_lo, t_hi = st_lo[s], st_hi[s]
            f = (c_hi * t_hi - c_lo * t_lo) / (c_hi - c_lo)
            w = c_lo * (t_lo - f)
            s_eff = t_lo / (t_hi * (c_hi / c_lo)) if t_hi > 0 else float("nan")
            tot_f += f
            tot_w += w
            md += (
                f"| {s} | {t_lo:.1f} | {t_hi:.1f} | {f:.1f} | {w:.0f} "
                f"| {s_eff:.2f} |\n"
            )
        md += (
            f"| **total (staged)** | {sum(st_lo[s] for s in common):.1f} "
            f"| {sum(st_hi[s] for s in common):.1f} | {tot_f:.1f} "
            f"| {tot_w:.0f} | |\n"
        )
    # SCALING.md is the curated full-history doc. Each run lands in the
    # UNCOMMITTED scratch file SCALING_RUN.md and gets folded into the
    # history by hand; pass --out BENCH/SCALING_LATEST.md explicitly to
    # refresh the committed gate-evidence record (a default-overwrite
    # once clobbered the sf1.0 gate table with a degraded-host probe).
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, args.out), "w") as fh:
        fh.write(md)
    print(f"efficiency={eff:.3f} -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
