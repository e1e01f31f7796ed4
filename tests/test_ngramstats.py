"""Top-k n-gram stats vs a collections.Counter oracle."""

from __future__ import annotations

import random
from collections import Counter

from sift_kg_spark.operators.ngramstats import top_ngrams


def py_top(docs, n, k):
    occ, carriers = Counter(), {}
    for did, text in docs:
        toks = text.strip().split()
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            occ[g] += 1
            carriers.setdefault(g, set()).add(did)
    ranked = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(g, c, len(carriers[g])) for g, c in ranked]


class TestTopNgrams:
    def _docs(self, seed=3, n_docs=60):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]  # small vocab -> many ties
        return [
            (i, " ".join(rng.choices(vocab, k=rng.randint(5, 40))))
            for i in range(n_docs)
        ]

    def test_matches_counter_oracle_with_ties(self, spark):
        docs = self._docs()
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        for n, k in ((2, 25), (3, 10)):
            got = [
                (r.gram, r.n_occurrences, r.n_docs)
                for r in top_ngrams(df, n=n, k=k).collect()
            ]
            assert got == py_top(docs, n, k), (n, k)

    def test_plan_is_take_ordered_not_global_sort(self, spark):
        df = spark.createDataFrame(self._docs(), ["doc_id", "text"])
        plan = (
            top_ngrams(df, n=2, k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan

    def test_short_docs_produce_no_rows(self, spark):
        df = spark.createDataFrame(
            [(0, "solo"), (1, "a b")], ["doc_id", "text"]
        )
        rows = top_ngrams(df, n=3, k=10).collect()
        assert rows == []
