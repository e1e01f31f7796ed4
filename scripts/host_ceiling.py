"""Host scaling ceiling: the pipeline's dominant Python work (tokenize +
shingle + MinHash + SimHash + band keys over real corpus text) run in K
ISOLATED fresh processes, no Spark — the upper bound any engine can reach
on this machine at K-way parallelism.

Round-1 finding (BENCH/BASELINE.md): this host serializes memory
page-fault supply, so per-task CPU inflates as process/worker count
grows. This script quantifies that ceiling for the exact level pair the
scaling bench uses; the engine's measured efficiency should be judged
against THIS, not against a perfect 1.0.

Usage: python scripts/host_ceiling.py [--levels 2,8] [--docs-per-proc 4000]
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


def worker(n_docs: int, seed: int) -> int:
    import pandas as pd

    from sift_kg_spark.config import DedupConfig
    from sift_kg_spark.fixtures import generate_corpus
    from sift_kg_spark.functions.features import compute_features_pdf
    from sift_kg_spark.functions.text import normalize_text_py

    pages, *_ = generate_corpus(n_docs, seed=seed)
    texts = pages["text"].map(normalize_text_py)
    cfg = DedupConfig()
    t0 = time.monotonic()
    # same 512-row batches as the Arrow config in session.py
    for lo in range(0, len(texts), 512):
        compute_features_pdf(
            pd.Series(texts.iloc[lo : lo + 512].values), cfg
        )
    print(json.dumps({"sec": round(time.monotonic() - t0, 3), "docs": len(texts)}))
    return 0


def run_level(k: int, docs_per_proc: int) -> float:
    """Total docs/sec with k isolated worker processes."""
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--docs", str(docs_per_proc), "--seed", str(100 + i)],
            stdout=subprocess.PIPE, text=True, cwd=REPO,
        )
        for i in range(k)
    ]
    t0 = time.monotonic()
    outs = [p.communicate()[0] for p in procs]
    wall = time.monotonic() - t0
    total_docs = sum(
        json.loads([ln for ln in o.splitlines() if ln.startswith("{")][-1])["docs"]
        for o in outs
    )
    return total_docs / wall


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--levels", default="2,8")
    p.add_argument("--docs-per-proc", type=int, default=4000)
    p.add_argument("--worker", action="store_true")
    p.add_argument("--docs", type=int)
    p.add_argument("--seed", type=int)
    args = p.parse_args()
    if args.worker:
        return worker(args.docs, args.seed)

    levels = [int(x) for x in args.levels.split(",")]
    lo, hi = min(levels), max(levels)
    tp = {}
    for k in (lo, hi, lo, hi):  # interleave, keep best
        rate = run_level(k, args.docs_per_proc)
        tp[k] = max(tp.get(k, 0.0), rate)
        print(json.dumps({"k": k, "docs_per_sec": round(rate, 1)}))
    eff = tp[hi] / ((hi / lo) * tp[lo])
    print(json.dumps({
        "levels": [lo, hi],
        "docs_per_sec": {str(k): round(v, 1) for k, v in tp.items()},
        "host_ceiling_efficiency": round(eff, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
