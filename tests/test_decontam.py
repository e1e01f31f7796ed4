"""Benchmark decontamination vs a brute-force Python oracle.

Planted construction: the benchmark holds a token slice of chosen
corpus docs, so those docs are contaminated by construction, docs
sharing no n-token run are provably clean, and a doc shorter than n
tokens can never be flagged.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

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


def _pages(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, "url string, text string").select(
        "url",
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )


CONTAM = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "unique trailing words to stay over the length floor here")
CLEAN = ("one two three four five six seven eight nine ten eleven "
         "twelve thirteen fourteen fifteen sixteen")
LONER = ("red orange yellow green blue indigo violet colors march "
         "across the evening sky in a wide calm band")


class TestPipelineDecontamTier:
    """Both directions: flag off -> contaminated docs cluster normally;
    flag on -> they quarantine as 'contaminated' and never merge, while
    clean clusters are untouched."""

    def _bench(self, tmp_path):
        import pandas as pd

        # the first 10 tokens of CONTAM — any 6-gram inside overlaps
        path = str(tmp_path / "bench.parquet")
        pd.DataFrame(
            {"text": [" ".join(CONTAM.split()[:10])]}
        ).to_parquet(path, index=False)
        return path

    def test_both_directions(self, spark, tmp_path):
        from sift_kg_spark.config import DedupConfig
        from sift_kg_spark.pipeline import run_dedup

        rows = [
            ("http://d.com/a1", CONTAM),
            ("http://d.com/a2", CONTAM),
            ("http://d.com/b1", CLEAN),
            ("http://d.com/b2", CLEAN),
            ("http://d.com/c", LONER),
        ]
        pages = _pages(spark, rows)
        bench = self._bench(tmp_path)

        off = run_dedup(spark, pages, DedupConfig(min_text_chars=10))
        assert off.assignments.count() == 5
        assert off.quarantine.count() == 0
        a_clusters = {
            r.cluster_id
            for r in off.assignments.filter(
                F.col("url").startswith("http://d.com/a")
            ).collect()
        }
        assert len(a_clusters) == 1  # the contaminated twins DO merge off

        on = run_dedup(
            spark,
            pages,
            DedupConfig(
                min_text_chars=10,
                decontaminate=True,
                decontam_benchmark_path=bench,
                decontam_ngram=6,
            ),
        )
        quar = on.quarantine.toPandas().sort_values("url")
        assert quar.reason.tolist() == ["contaminated", "contaminated"]
        assert quar.url.tolist() == ["http://d.com/a1", "http://d.com/a2"]
        kept = on.assignments.toPandas()
        assert sorted(kept.url) == [
            "http://d.com/b1", "http://d.com/b2", "http://d.com/c"
        ]
        b = kept[kept.url.str.startswith("http://d.com/b")]
        assert b.cluster_id.nunique() == 1  # clean cluster untouched

    def test_missing_path_raises(self, spark):
        import pytest as _pytest

        from sift_kg_spark.config import DedupConfig
        from sift_kg_spark.pipeline import run_dedup

        pages = _pages(spark, [("http://d.com/a", CLEAN)])
        with _pytest.raises(ValueError, match="decontam_benchmark_path"):
            run_dedup(spark, pages, DedupConfig(decontaminate=True))


class TestIncrementalDecontam:
    """The benchmark is static state, so the tier composes with
    incremental appends unchanged: combined incremental result equals a
    full run over the combined corpus, with a contaminated twin pair
    straddling the base/batch split."""

    def test_combined_equals_full(self, spark, tmp_path):
        from sift_kg_spark.config import DedupConfig
        from sift_kg_spark.incremental import run_dedup_incremental
        from sift_kg_spark.pipeline import run_dedup

        import pandas as pd

        bench = str(tmp_path / "bench.parquet")
        pd.DataFrame(
            {"text": [" ".join(CONTAM.split()[:10])]}
        ).to_parquet(bench, index=False)
        cfg = DedupConfig(
            min_text_chars=10,
            decontaminate=True,
            decontam_benchmark_path=bench,
            decontam_ngram=6,
        )
        base_rows = [
            ("http://d.com/a1", CONTAM),
            ("http://d.com/b1", CLEAN),
            ("http://d.com/c", LONER),
        ]
        batch_rows = [
            ("http://d.com/a2", CONTAM),   # contaminated twin in the batch
            ("http://d.com/b2", CLEAN),
        ]
        full = run_dedup(
            spark, _pages(spark, base_rows + batch_rows), cfg,
            workdir=str(tmp_path / "full"),
        )
        run_dedup(
            spark, _pages(spark, base_rows), cfg,
            workdir=str(tmp_path / "base"),
        )
        inc = run_dedup_incremental(
            spark, _pages(spark, batch_rows), cfg,
            base_workdir=str(tmp_path / "base"),
            workdir=str(tmp_path / "incr"),
        )
        want = {
            (r.url, r.canonical_url, r.cluster_size)
            for r in full.assignments.collect()
        }
        got = {
            (r.url, r.canonical_url, r.cluster_size)
            for r in inc.assignments.collect()
        }
        assert got == want
        # both contaminated docs quarantined in their own generations
        assert {r.url for r in full.quarantine.collect()} == {
            "http://d.com/a1", "http://d.com/a2"
        }
