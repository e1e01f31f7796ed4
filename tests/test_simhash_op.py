"""Standalone SimHash-Hamming near-dup operator (operators/simhash).

Parity oracle: the expected pair set is computed in pure Python from the
SAME kernel (``hashing.simhash64``) — all pairs with Hamming <=
max_hamming that keep >= 2 clean chunks (the operator's documented
candidate semantics). No tolerance, exact set equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sift_kg_spark.functions.hashing import simhash64, tokenize_batch
from sift_kg_spark.operators.simhash import (
    simhash_fingerprints,
    simhash_near_dup_pairs,
)


def python_fingerprints(texts: list[str]) -> np.ndarray:
    th, off = tokenize_batch(pd.Series(texts))
    return simhash64(th, off)


def brute_force_pairs(
    ids: list, fps: np.ndarray, max_hamming: int, n_chunks: int = 4
) -> set:
    width = 64 // n_chunks
    mask = np.uint64((1 << width) - 1)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = bin(int(fps[i]) ^ int(fps[j])).count("1")
            if ham > max_hamming:
                continue
            clean = sum(
                1
                for c in range(n_chunks)
                if ((fps[i] >> np.uint64(c * width)) & mask)
                == ((fps[j] >> np.uint64(c * width)) & mask)
            )
            if clean >= 2:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, ham))
    return out


def corpus() -> list[tuple[str, str]]:
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega one two three four five six seven eight nine ten "
    ) * 3
    toks = base.split()
    rows = [("d00", " ".join(toks))]
    # one- and two-token substitutions of the base (low Hamming family)
    for n_edits, name in [(1, "d01"), (2, "d02")]:
        t = list(toks)
        for e in range(n_edits):
            t[5 + 7 * e] = f"edit{e}"
        rows.append((name, " ".join(t)))
    rows.append(("d03", " ".join(toks)))  # exact copy of d00
    # unrelated documents
    for i in range(6):
        rows.append(
            (
                f"u{i:02d}",
                " ".join(f"word{i}x{j}" for j in range(80)),
            )
        )
    return rows


class TestSimhashOperator:
    def test_fingerprints_match_kernel(self, spark):
        rows = corpus()
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash_fingerprints(df).collect()
        }
        want = python_fingerprints([t for _, t in rows]).view(np.int64)
        for (doc_id, _), fp in zip(rows, want):
            assert got[doc_id] == int(fp), doc_id

    def test_pairs_match_brute_force(self, spark):
        rows = corpus()
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_dup_pairs(df, max_hamming=6).collect()
        }
        fps = python_fingerprints([t for _, t in rows])
        want = brute_force_pairs([i for i, _ in rows], fps, max_hamming=6)
        assert got == want
        # the family must actually be non-trivial: the exact copy plus at
        # least one genuine near-dup pair
        assert ("d00", "d03", 0) in got
        assert any(h > 0 for (_, _, h) in got)

    def test_hot_bucket_star_degradation(self, spark):
        text = " ".join(f"tok{i}" for i in range(60))
        rows = [(f"c{i:03d}", text) for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = simhash_near_dup_pairs(df, max_hamming=0, hot_cap=4).collect()
        # star pairing: every pair includes the min-id representative,
        # O(n) pairs instead of C(12,2)=66
        assert len(got) == 11
        assert all(r["id_a"] == "c000" and r["hamming"] == 0 for r in got)

    def test_n_chunks_validation(self, spark):
        df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
        with pytest.raises(ValueError, match="divide 64"):
            simhash_near_dup_pairs(df, n_chunks=5)

    def test_salted_sizing_bit_identical(self, spark):
        """The r6 sizing rewrite routes the standalone operator through
        ``lsh.sized_buckets``; the salted (two-level pre-salted count)
        and window modes must emit bit-identical pairs, including across
        the hot-cap star threshold (mixed corpus: a 12-member template
        bucket past hot_cap=4, a genuine near-dup family, singletons)."""
        text = " ".join(f"tok{i}" for i in range(60))
        rows = corpus() + [(f"c{i:03d}", text) for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        cols = ["id_a", "id_b", "hamming"]
        window = sorted(
            tuple(r[c] for c in cols)
            for r in simhash_near_dup_pairs(
                df, max_hamming=6, hot_cap=4
            ).collect()
        )
        salted = sorted(
            tuple(r[c] for c in cols)
            for r in simhash_near_dup_pairs(
                df, max_hamming=6, hot_cap=4, salted_sizing=True
            ).collect()
        )
        assert window == salted
        # star pairs of the hot template bucket are present in both
        star = [p for p in window if p[0] == "c000" and p[2] == 0]
        assert len(star) >= 11
