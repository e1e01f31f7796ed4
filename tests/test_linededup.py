"""Span (line) dedup + repetition stats (operators/linededup).

Planted-construction tests: documents built from known 4-token chunks so
boilerplate membership, clean-text reassembly, and the Gopher fractions
are computable by hand.
"""

from __future__ import annotations

import pandas as pd
import pytest

from sift_kg_spark.operators.linededup import (
    boilerplate_chunks,
    chunk_segments,
    line_dedup,
    repetition_stats,
)

BP = "cookie notice accept all"  # the planted boilerplate chunk
U = ["alpha beta gamma delta", "eps zeta eta theta", "iota kappa mu nu"]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0: boilerplate + unique
        (0, f"{BP} {U[0]}"),
        # doc 1: unique + boilerplate (different position)
        (1, f"{U[1]} {BP}"),
        # doc 2: boilerplate twice + unique -> within-doc dup chunk
        (2, f"{BP} {BP} {U[2]}"),
        # doc 3: pure boilerplate -> clean_text must be ''
        (3, BP),
        # doc 4: no boilerplate at all
        (4, f"{U[0]} {U[1]}"),
        # doc 5: short tail chunk (6 tokens -> chunks of 4 + 2)
        (5, "one two three four five six"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


class TestChunking:
    def test_segments_preserve_order_and_tail(self, docs):
        seg = chunk_segments(docs, chunk_tokens=4).toPandas()
        d5 = seg[seg.doc_id == 5].sort_values("chunk_idx")
        assert d5.chunk.tolist() == ["one two three four", "five six"]
        d2 = seg[seg.doc_id == 2].sort_values("chunk_idx")
        assert d2.chunk.tolist() == [BP, BP, U[2]]

    def test_boilerplate_needs_distinct_docs(self, docs):
        seg = chunk_segments(docs, chunk_tokens=4)
        # BP appears in docs {0,1,2,3} -> 4 distinct docs; U[0] in {0,4}
        # (2 docs) and doc 2's double-BP counts once
        bp3 = boilerplate_chunks(seg, min_docs=3).toPandas()
        assert bp3.chunk.tolist() == [BP]
        assert bp3.n_docs.tolist() == [4]
        bp2 = boilerplate_chunks(seg, min_docs=2).toPandas()
        assert set(bp2.chunk) == {BP, U[0], U[1]}


class TestLineDedup:
    def test_clean_text_and_counts(self, docs):
        out = (
            line_dedup(docs, chunk_tokens=4, min_docs=3)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "clean_text"] == U[0]
        assert out.loc[1, "clean_text"] == U[1]
        # order preserved, both copies removed
        assert out.loc[2, "clean_text"] == U[2]
        assert out.loc[2, "n_boilerplate"] == 2
        # pure boilerplate -> empty survivor
        assert out.loc[3, "clean_text"] == ""
        assert out.loc[3, "n_chunks"] == 1
        # untouched doc keeps its exact text
        assert out.loc[4, "clean_text"] == f"{U[0]} {U[1]}"
        assert out.loc[4, "n_boilerplate"] == 0
        assert out.loc[5, "clean_text"] == "one two three four five six"

    def test_null_text_docs_are_excluded(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d", None]})
        )
        out = line_dedup(df, chunk_tokens=4, min_docs=2).toPandas()
        assert out.doc_id.tolist() == [0]


class TestChunkerFuzz:
    def test_chunker_matches_python_oracle(self, spark):
        """Seeded fuzz: 200 random token streams (ragged lengths incl.
        empty-ish, repeated tokens, len % K in {0..K-1}) chunked by the
        Spark expression must equal a pure-Python chunker, per doc and
        in order."""
        import random

        rng = random.Random(4242)
        vocab = [f"w{i}" for i in range(12)]
        rows = []
        for did in range(200):
            n = rng.randrange(1, 40)
            rows.append((did, " ".join(rng.choice(vocab) for _ in range(n))))
        for k in (1, 3, 4, 7):
            df = spark.createDataFrame(
                pd.DataFrame(rows, columns=["doc_id", "text"])
            )
            got = (
                chunk_segments(df, chunk_tokens=k)
                .toPandas()
                .sort_values(["doc_id", "chunk_idx"])
            )
            want = []
            for did, text in rows:
                toks = text.split(" ")
                for ci in range(0, (len(toks) + k - 1) // k):
                    want.append((did, ci, " ".join(toks[ci * k : ci * k + k])))
            assert list(map(tuple, got.to_records(index=False))) == want


class TestRepetitionStats:
    def test_dup_chunk_frac(self, docs):
        out = (
            repetition_stats(docs, chunk_tokens=4)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        # doc 2: chunks [BP, BP, U2] -> 1 - 2/3
        assert out.loc[2, "dup_chunk_frac"] == pytest.approx(1 - 2 / 3)
        assert out.loc[0, "dup_chunk_frac"] == 0.0

    def test_top_bigram_frac(self, spark):
        # 'a b a b a' -> bigrams [a b, b a, a b, b a] -> top 2/4
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["a b a b a", "solo"]})
        )
        out = (
            repetition_stats(df, chunk_tokens=4)
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "top_bigram_frac"] == pytest.approx(0.5)
        # single-token doc: no bigrams -> 0.0 (coalesced), still present
        assert out.loc[1, "top_bigram_frac"] == 0.0
        assert out.loc[1, "n_chunks"] == 1


def test_pipeline_span_dedup_tier(spark):
    """cfg.span_dedup wires line_dedup into the prepare stage: a
    boilerplate block shared by most docs must stop driving near-dup
    decisions. OFF: all six docs collapse into one boilerplate-driven
    mega-cluster. ON: the two docs with identical unique content become
    an exact-dup pair, the three distinct docs stay singletons, and the
    pure-boilerplate doc quarantines as near_empty (C4's post-dedup
    length floor)."""
    from pyspark.sql import functions as F

    from sift_kg_spark import DedupConfig
    from sift_kg_spark.pipeline import run_dedup

    bp = " ".join(f"boiler{i:03d}" for i in range(200))   # 40 x 5-token chunks
    uq = " ".join(f"unique{i:02d}" for i in range(20))    # shared by docs 1+2
    vs = [" ".join(f"only{d}x{i:02d}" for i in range(20)) for d in range(3)]
    rows = [
        ("u1", f"{uq} {bp}"),      # unique + boilerplate
        ("u2", f"{bp} {uq}"),      # boilerplate + unique (grid-aligned: 200 % 5 == 0)
        ("v0", f"{bp} {vs[0]}"),
        ("v1", f"{bp} {vs[1]}"),
        ("v2", f"{bp} {vs[2]}"),
        ("b6", bp),                # pure boilerplate
    ]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text"]).assign(
            lang="en", html=None
        )
    ).select("url", "lang", "text", F.col("html").cast("binary"))

    def amap(res):
        return {r["url"]: r["cluster_id"] for r in res.assignments.collect()}

    dirty = amap(run_dedup(spark, pages, DedupConfig()))
    assert len(set(dirty.values())) == 1, (
        f"boilerplate must drive a false mega-cluster when OFF: {dirty}"
    )

    cfg = DedupConfig(
        span_dedup=True, span_dedup_chunk_tokens=5, span_dedup_min_docs=3
    )
    res = run_dedup(spark, pages, cfg)
    clean = amap(res)
    assert "b6" not in clean, "pure-boilerplate doc must quarantine"
    q = {r["url"]: r["reason"] for r in res.quarantine.collect()}
    assert q.get("b6") == "near_empty"
    assert clean["u1"] == clean["u2"], "identical after cleaning -> one cluster"
    others = [clean["v0"], clean["v1"], clean["v2"]]
    assert len(set(others)) == 3, f"distinct docs must not merge: {clean}"
    assert clean["u1"] not in others
