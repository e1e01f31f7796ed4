"""PII redaction vs a Python ``re`` oracle (same patterns, third engine
after Spark/Java and the driver's DuckDB/RE2 oracle)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sift_kg_spark.functions.pii import (
    DEFAULT_KINDS,
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)

SAMPLES = [
    "plain text with no identifiers at all",
    "mail bob@example.com and sue+tag@mail.example.org twice",
    "call +1 555 123 4567 or (212) 555-0199 now",
    "host 10.0.0.1 and 192.168.255.254 up",
    "mixed: a@b.co, +49 30 1234 5678, 8.8.8.8 together",
    "punctuation-adjacent: (bob@example.com), [10.0.0.1].",
    "not-pii: version 1.2.3, price +3 dollars, at sign @ alone",
]


def py_redact(text: str) -> str:
    for kind in DEFAULT_KINDS:
        pat, rep = PII_PATTERNS[kind]
        text = re.sub(pat, rep, text)
    return text


class TestPii:
    def _run(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["i", "text"]
        )
        out = df.select(
            "i",
            redact_pii(F.col("text")).alias("red"),
            *pii_counts(F.col("text")),
        ).collect()
        return {r.i: r for r in out}

    def test_matches_python_oracle(self, spark):
        rows = self._run(spark, SAMPLES)
        for i, text in enumerate(SAMPLES):
            assert rows[i].red == py_redact(text), text
            for kind in DEFAULT_KINDS:
                want = len(re.findall(PII_PATTERNS[kind][0], text))
                assert rows[i][f"n_{kind}"] == want, (text, kind)
        # the planted rows are non-vacuous
        assert rows[1].n_email == 2 and rows[2].n_phone == 2
        assert rows[3].n_ip == 2 and rows[6].red == SAMPLES[6]

    def test_idempotent(self, spark):
        once = [py_redact(t) for t in SAMPLES]
        rows = self._run(spark, once)
        for i, t in enumerate(once):
            assert rows[i].red == t  # placeholders never re-match


class TestPipelinePiiTier:
    """Both directions: flag off -> raw identifiers reach the prepared
    stage and identifier-differing twins hash apart; flag on -> no raw
    identifier survives and the twins become exact duplicates."""

    def test_both_directions(self, spark, tmp_path):
        import pandas as pd

        from sift_kg_spark.config import DedupConfig
        from sift_kg_spark.pipeline import run_dedup

        body = ("a steady paragraph of perfectly ordinary prose that "
                "keeps both variants comfortably over the length floor ")
        rows = [
            ("http://p.com/x1", body + "reach me at alice@example.com"),
            ("http://p.com/x2", body + "reach me at carol@example.net"),
        ]
        pages = spark.createDataFrame(
            rows, "url string, text string"
        ).select(
            "url",
            F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text",
            F.lit("en").alias("lang"),
        )

        run_dedup(spark, pages, DedupConfig(min_text_chars=10),
                  workdir=str(tmp_path / "off"))
        off = pd.read_parquet(str(tmp_path / "off" / "prepared.parquet"))
        assert off.sha.nunique() == 2
        assert off.text_norm.str.contains("alice@example.com").any()

        run_dedup(spark, pages,
                  DedupConfig(min_text_chars=10, redact_pii=True),
                  workdir=str(tmp_path / "on"))
        on = pd.read_parquet(str(tmp_path / "on" / "prepared.parquet"))
        assert on.sha.nunique() == 1          # twins now exact dups
        joined = " ".join(on.text_norm)
        assert "alice@example.com" not in joined
        assert "carol@example.net" not in joined
        assert "<email>" in joined or "<EMAIL>" in joined
