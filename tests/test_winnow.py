"""Winnowing fingerprints vs a brute-force Python oracle.

The Python reference below is the textbook algorithm (Schleimer et al.
2003): md5-hex k-gram hashes, min over every full window of w
consecutive grams, distinct values. The Spark operator must reproduce
its output EXACTLY (the driver's DuckDB oracle pins the same semantics
a third way).
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sift_kg_spark.operators.winnow import (
    fingerprint_pairs,
    token_kgram_hashes,
    winnow_fingerprints,
)


def py_winnow(text: str, k: int, w: int) -> set:
    toks = text.strip().split()
    grams = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:16]
        for i in range(len(toks) - k + 1)
    ]
    return {min(grams[i : i + w]) for i in range(len(grams) - w + 1)}


def py_pairs(fps: dict, min_shared: int, hot_cap: int) -> dict:
    """Mirror of fingerprint_pairs over {doc_id: fp_set}."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for d, s in fps.items():
        for fp in s:
            buckets[fp].append(d)
    counts: dict = defaultdict(int)
    for fp, docs in buckets.items():
        docs = sorted(docs)
        if len(docs) < 2:
            continue
        if len(docs) <= hot_cap:
            for i, a in enumerate(docs):
                for b in docs[i + 1 :]:
                    counts[(a, b)] += 1
        else:
            rep = docs[0]
            for d in docs[1:]:
                counts[(rep, d)] += 1
    return {p: n for p, n in counts.items() if n >= min_shared}


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


@pytest.fixture(scope="module")
def rand_texts():
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        for _ in range(80)
    ]
    # planted overlap: doc pairs sharing an 8-token run (>= w + k - 1 = 6)
    run = " ".join(rng.choice(vocab) for _ in range(8))
    texts += [f"aa bb {run} cc", f"xx yy zz {run}"]
    # degenerate shapes
    texts += ["", "one", "one two", "one two three", "  padded   spaces  x y z q r "]
    return texts


def test_winnow_matches_python_oracle(spark, rand_texts):
    k, w = 3, 4
    got = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(_docs(spark, rand_texts), k=k, w=w).collect()
    }
    want = {
        (i, fp)
        for i, t in enumerate(rand_texts)
        for fp in py_winnow(t, k, w)
    }
    assert got == want


def test_kgram_positions_and_counts(spark):
    df = _docs(spark, ["a b c d e", "a b", ""])
    rows = token_kgram_hashes(df, k=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["gram_hash"]))
    assert sorted(by_doc) == [0]  # short docs emit nothing
    assert sorted(p for p, _ in by_doc[0]) == [1, 2, 3]
    assert all(r["n_grams"] == 3 for r in rows)
    want = hashlib.md5(b"a b c").hexdigest()[:16]
    assert dict(by_doc[0])[1] == want


def test_shared_run_guarantee(spark):
    # any shared token run of >= w + k - 1 tokens => >= 1 shared fp value
    k, w = 3, 4
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(30)]
    for trial in range(10):
        run_len = w + k - 1 + rng.randint(0, 4)
        run = " ".join(rng.choice(vocab) for _ in range(run_len))
        a = " ".join(rng.choice(vocab) for _ in range(5)) + " " + run
        b = run + " " + " ".join(rng.choice(vocab) for _ in range(7))
        fps = winnow_fingerprints(_docs(spark, [a, b]), k=k, w=w).collect()
        sets = {0: set(), 1: set()}
        for r in fps:
            sets[r["doc_id"]].add(r["fp"])
        assert sets[0] & sets[1], f"trial {trial}: no shared fp for shared run"


def test_fingerprint_pairs_matches_python(spark, rand_texts):
    k, w, min_shared, hot_cap = 3, 4, 2, 8
    fps_df = winnow_fingerprints(_docs(spark, rand_texts), k=k, w=w)
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in fingerprint_pairs(
            fps_df, min_shared=min_shared, hot_cap=hot_cap
        ).collect()
    }
    fps = {i: py_winnow(t, k, w) for i, t in enumerate(rand_texts)}
    assert got == py_pairs(fps, min_shared, hot_cap)
    # the planted 8-token-run pair must be detected
    planted = (len(rand_texts) - 7, len(rand_texts) - 6)
    assert planted in got


def test_hot_bucket_star_degradation(spark):
    # 20 docs all containing the same long run -> its fps are hot buckets;
    # with hot_cap below the bucket size every pair must involve the
    # min-id representative (star shape), never a full O(n^2) clique.
    k, w, hot_cap = 3, 4, 8
    run = " ".join(f"s{i}" for i in range(10))
    texts = [f"u{i} v{i} {run}" for i in range(20)]
    fps_df = winnow_fingerprints(_docs(spark, texts), k=k, w=w)
    pairs = fingerprint_pairs(fps_df, min_shared=1, hot_cap=hot_cap).collect()
    assert pairs, "star pairs must still fire for hot buckets"
    fps = {i: py_winnow(t, k, w) for i, t in enumerate(texts)}
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in pairs}
    assert got == py_pairs(fps, 1, hot_cap)
    # star: the shared-run fingerprints only pair against doc 0
    shared_fps = set.intersection(*fps.values())
    assert shared_fps
    for (a, b), _ in got.items():
        if fps[a] & fps[b] & shared_fps:
            assert a == 0 or b == 0


def test_winnow_plan_is_doc_partitioned(spark, rand_texts):
    # the winnowing window must partition by doc (never a global window),
    # and the pair exchange must shuffle the fp table exactly once
    plan = winnow_fingerprints(_docs(spark, rand_texts))._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "No Partition Defined" not in plan


def test_winnow_unicode_three_engine_parity(spark):
    """Non-ASCII tokens are where md5-over-text contracts diverge between
    engines (byte encoding). Pin Spark == DuckDB == Python on accented /
    CJK / emoji tokens — all three must hash the same utf-8 bytes."""
    import duckdb
    import pandas as pd

    texts = [
        "café naïve über straße café naïve über straße café naïve",
        "日本語 の 文書 です 日本語 の 文書 です 日本語 の",
        "mixé ascii and 中文 tokens mixé ascii and 中文 tokens",
        "🙂 emoji 🙃 tokens 🙂 emoji 🙃 tokens 🙂 emoji",
    ]
    k, w = 3, 4
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    got_spark = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(
            spark.createDataFrame(pdf), k=k, w=w
        ).collect()
    }
    want_py = {
        (i, fp) for i, t in enumerate(texts) for fp in py_winnow(t, k, w)
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    got_duck = set(
        map(
            tuple,
            con.execute(
                f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ), grams AS (
            SELECT doc_id, i AS pos,
                   substr(md5(array_to_string(t[i : i+{k-1}], ' ')), 1, 16)
                       AS gram_hash,
                   len(t) - {k} + 1 AS n_grams
            FROM toks,
                 LATERAL UNNEST(range(1, CAST(len(t) - {k} + 2 AS BIGINT))) AS u(i)
            WHERE len(t) >= {k}
        ), mins AS (
            SELECT doc_id, pos, n_grams,
                   min(gram_hash) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {w-1} FOLLOWING) AS fp
            FROM grams
        )
        SELECT DISTINCT doc_id, fp FROM mins WHERE pos <= n_grams - {w} + 1
        """
            ).fetchall(),
        )
    )
    assert got_spark == want_py
    assert got_duck == want_py
