"""Benchmark decontamination vs a brute-force Python oracle.

Planted construction: the benchmark holds a token slice of chosen
corpus docs, so those docs are contaminated by construction, docs
sharing no n-token run are provably clean, and a doc shorter than n
tokens can never be flagged.
"""

from __future__ import annotations

import random

import pytest

from sift_kg_spark.operators.decontam import decontaminate


def py_hits(text: str, bench_texts: list, n: int) -> int:
    def grams(t):
        toks = t.strip().split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    bg = set()
    for b in bench_texts:
        bg |= grams(b)
    return len(grams(text) & bg)


def _mk_corpus(rng, n_docs=40, lo=12, hi=60):
    vocab = [f"w{i}" for i in range(300)]
    return [
        (i, " ".join(rng.choices(vocab, k=rng.randint(lo, hi))))
        for i in range(n_docs)
    ]


class TestDecontaminate:
    N = 5

    def _run(self, spark, corpus, bench, **kw):
        cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
        bdf = spark.createDataFrame([(t,) for t in bench], ["text"])
        out = decontaminate(cdf, bdf, n=self.N, **kw)
        return {r.doc_id: r for r in out.collect()}

    def test_planted_slices_flagged_and_exact_counts(self, spark):
        rng = random.Random(7)
        corpus = _mk_corpus(rng)
        # benchmark = a 9-token mid-slice of docs 3, 11, 25
        bench = []
        for did in (3, 11, 25):
            toks = corpus[did][1].split()
            bench.append(" ".join(toks[2:11]))
        rows = self._run(spark, corpus, bench)
        assert len(rows) == len(corpus)
        for did, text in corpus:
            expect = py_hits(text, bench, self.N)
            assert rows[did].n_hits == expect, did
            assert rows[did].contaminated == (expect >= 1)
            assert rows[did].n_grams == max(len(text.split()) - self.N + 1, 0)
        # the planted sources must be flagged (9-token slice -> 5 grams)
        for did in (3, 11, 25):
            assert rows[did].contaminated
            assert rows[did].n_hits >= 5

    def test_short_doc_never_contaminated(self, spark):
        corpus = [(0, "a b c"), (1, "a b c d e f g h")]
        bench = ["a b c d e f g h"]
        rows = self._run(spark, corpus, bench)
        assert rows[0].n_grams == 0 and not rows[0].contaminated
        assert rows[1].contaminated

    def test_min_hits_threshold(self, spark):
        # doc shares exactly ONE 5-gram with the benchmark
        corpus = [(0, "p q r s t x y z u v")]
        bench = ["p q r s t"]
        one = self._run(spark, corpus, bench)
        assert one[0].n_hits == 1 and one[0].contaminated
        two = self._run(spark, corpus, bench, min_hits=2)
        assert two[0].n_hits == 1 and not two[0].contaminated

    def test_no_broadcast_mode_identical(self, spark):
        rng = random.Random(11)
        corpus = _mk_corpus(rng, n_docs=25)
        bench = [" ".join(corpus[5][1].split()[1:10])]
        a = self._run(spark, corpus, bench)
        b = self._run(spark, corpus, bench, broadcast_benchmark=False)
        assert {k: (v.n_hits, v.contaminated) for k, v in a.items()} == {
            k: (v.n_hits, v.contaminated) for k, v in b.items()
        }
