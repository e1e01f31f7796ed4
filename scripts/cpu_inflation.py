"""CPU-inflation experiment: is the scaling deficit inside the engine?

Runs the SAME dedup job at two parallelism levels with Spark event logs
enabled, then compares the summed per-task executor CPU time. The job's
logical work is identical at both levels (same 32-partition plans, same
input), so:

  * engine-structural non-scaling (extra shuffles, serial stages, driver
    loops) would appear as MORE TASKS or more scheduler/result time, with
    per-task CPU unchanged;
  * host-level serialization (memory page-fault supply, round-1 finding)
    appears as the SAME tasks taking more CPU/wall per task as
    parallelism grows — work the engine cannot remove.

Prints one JSON line per level: total task count, summed executorRunTime,
summed executorCpuTime, and the inflation ratio high/low.

Usage: python scripts/cpu_inflation.py [--sf 0.1] [--levels 2,8]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cores: int, pages_path: str, eventlog_dir: str) -> int:
    from sift_kg_spark import DedupConfig, get_spark
    from sift_kg_spark.pipeline import run_dedup
    from sift_kg_spark.session import _local_scratch_dir

    spark = get_spark(
        app_name=f"cpuinfl_{cores}",
        cores=cores,
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{eventlog_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    pages = spark.read.parquet(pages_path)
    pages.count()
    import shutil

    wd = tempfile.mkdtemp(prefix=f"cpuinfl_wd_{cores}_", dir=_local_scratch_dir())
    res = run_dedup(spark, pages, DedupConfig(), workdir=wd, resume=False)
    res.assignments.count()
    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()
    return 0


def _eventlog_lines(path: str):
    # Spark 4 rolling event logs are DIRECTORIES (eventlog_v2_*/events_*).
    paths = (
        sorted(glob.glob(os.path.join(path, "events_*")))
        if os.path.isdir(path)
        else [path]
    )
    for p in paths:
        with open(p) as fh:
            yield from fh


def parse_eventlog(path: str) -> dict:
    n_tasks = 0
    run_ms = 0.0
    cpu_ns = 0.0
    gc_ms = 0.0
    for line in _eventlog_lines(path):
        if '"Event":"SparkListenerTaskEnd"' not in line:
            continue
        ev = json.loads(line)
        tm = ev.get("Task Metrics") or {}
        n_tasks += 1
        run_ms += tm.get("Executor Run Time", 0)
        cpu_ns += tm.get("Executor CPU Time", 0)
        gc_ms += tm.get("JVM GC Time", 0)
    return {
        "n_tasks": n_tasks,
        "executor_run_sec": round(run_ms / 1e3, 1),
        "executor_cpu_sec": round(cpu_ns / 1e9, 1),
        "gc_sec": round(gc_ms / 1e3, 1),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", type=float, default=0.1)
    p.add_argument("--levels", default="2,8")
    p.add_argument("--child", action="store_true")
    p.add_argument("--cores", type=int)
    p.add_argument("--pages")
    p.add_argument("--eventlog-dir")
    args = p.parse_args()

    if args.child:
        return child(args.cores, args.pages, args.eventlog_dir)

    from bench import ensure_corpus

    corpus_dir = ensure_corpus(args.sf, REPO)
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    levels = [int(x) for x in args.levels.split(",")]

    out: dict[int, dict] = {}
    for cores in levels:
        evdir = tempfile.mkdtemp(prefix=f"cpuinfl_ev_{cores}_")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--cores", str(cores), "--pages", pages_path,
             "--eventlog-dir", evdir],
            cwd=REPO, check=True, capture_output=True, text=True,
        )
        logs = glob.glob(os.path.join(evdir, "*"))
        stats = parse_eventlog(max(logs, key=os.path.getmtime))
        stats["cores"] = cores
        out[cores] = stats
        print(json.dumps(stats), flush=True)

    lo, hi = min(levels), max(levels)
    infl_cpu = out[hi]["executor_cpu_sec"] / max(out[lo]["executor_cpu_sec"], 1e-9)
    infl_run = out[hi]["executor_run_sec"] / max(out[lo]["executor_run_sec"], 1e-9)
    print(json.dumps({
        "task_count_ratio": round(out[hi]["n_tasks"] / out[lo]["n_tasks"], 3),
        "cpu_inflation": round(infl_cpu, 3),
        "run_inflation": round(infl_run, 3),
        "note": "task_count_ratio ~1 + cpu_inflation >> 1 => identical work, "
                "host-inflated per-task cost (outside the engine)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
