"""Gopher quality flags + URL canonicalization / capture dedup."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from sift_kg_spark.functions.quality import gopher_flags
from sift_kg_spark.functions.urls import (
    canonical_url,
    canonicalize,
    dedup_captures,
)

from pyspark.sql import functions as F


class TestGopherFlags:
    def _flags(self, spark, rows, **kw):
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )
        out = gopher_flags(df, **kw).toPandas().set_index("doc_id")
        return out

    def test_word_count_bounds(self, spark):
        rows = [
            (0, "the a " + "word " * 48),          # 50 words -> ok
            (1, "the a of to"),                     # 4 words -> too short
        ]
        out = self._flags(spark, rows, min_words=50)
        assert out.loc[0, "words_ok"] == 1
        assert out.loc[1, "words_ok"] == 0
        assert out.loc[1, "keep"] == 0

    def test_mean_word_length(self, spark):
        rows = [
            (0, "aa " * 30 + "the a"),               # mean ~2 -> reject
            (1, "pneumonoultramicroscopics " * 40),  # mean 25 -> reject
            (2, "the quick brown fox and dog " * 10),
        ]
        out = self._flags(spark, rows, min_words=5)
        assert out.loc[0, "word_len_ok"] == 0
        assert out.loc[1, "word_len_ok"] == 0
        assert out.loc[2, "word_len_ok"] == 1

    def test_symbol_ratio_and_stopwords(self, spark):
        junk = "#### ## # !!! ... ;; " * 10
        clean = "the table and a chair of wood " * 10
        out = self._flags(spark, [(0, junk), (1, clean)], min_words=5)
        assert out.loc[0, "symbol_ok"] == 0
        assert out.loc[0, "stopword_ok"] == 0
        assert out.loc[1, "symbol_ok"] == 1
        assert out.loc[1, "stopword_ok"] == 1
        assert out.loc[1, "keep"] == 1

    def test_stopwords_counted_distinct(self, spark):
        # 'the' repeated 10x is still ONE distinct stopword
        out = self._flags(
            spark, [(0, "the " * 10 + "xyzzy " * 10)],
            min_words=5, min_stopwords=2,
        )
        assert out.loc[0, "n_stopwords"] == 1
        assert out.loc[0, "stopword_ok"] == 0


CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM/Path/Page", "http://www.example.com/Path/Page"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?utm_source=x&b=2&a=1",
     "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?utm_source=x&fbclid=y",
     "http://example.com/a"),
    ("http://example.com/a/", "http://example.com/a"),
    ("http://example.com/", "http://example.com/"),
    ("http://example.com/a/?b=1", "http://example.com/a?b=1"),
    ("http://example.com/A?z=1&y=2&ref=tw#x",
     "http://example.com/A?y=2&z=1"),
    # case-sensitive path/query, case-insensitive authority
    ("HTTPS://HOST.COM:443/CaSe?Q=V", "https://host.com/CaSe?Q=V"),
]


class TestCanonicalUrl:
    def test_case_matrix(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(CASES, columns=["url", "want"])
        )
        got = df.withColumn("got", canonical_url(F.col("url"))).toPandas()
        for _, r in got.iterrows():
            assert r["got"] == r["want"], r["url"]

    def test_null_and_relative(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"url": [None, "not a url"]})
        )
        out = canonicalize(df).toPandas()
        assert out.canonical_url.tolist() == [None, "not a url"]


class TestDedupCaptures:
    def test_latest_capture_wins(self, spark):
        t = datetime.datetime(2024, 1, 1)
        rows = [
            ("http://E.com/a?utm_source=x", t),
            ("http://e.com/a", t + datetime.timedelta(days=1)),
            ("http://e.com/a#f", t + datetime.timedelta(days=2)),
            ("http://e.com/b", t),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
        out = (
            dedup_captures(df)
            .toPandas()
            .set_index("canonical_url")
            .sort_index()
        )
        assert out.loc["http://e.com/a", "n_captures"] == 3
        assert out.loc["http://e.com/a", "url"] == "http://e.com/a#f"
        assert out.loc["http://e.com/b", "n_captures"] == 1

    def test_tie_breaks_on_raw_url(self, spark):
        t = datetime.datetime(2024, 1, 1)
        rows = [("http://e.com/a", t), ("http://e.com/a/", t)]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
        out = dedup_captures(df).toPandas()
        assert len(out) == 1
        # max_by struct(ts, url): '/'-suffixed string sorts after
        assert out.loc[0, "url"] == "http://e.com/a/"

    def test_latest_captures_schema_preserving(self, spark):
        from sift_kg_spark.functions.urls import latest_captures

        t = datetime.datetime(2024, 1, 1)
        rows = [
            ("http://e.com/a?utm_source=x", t, "old text"),
            ("http://e.com/a", t + datetime.timedelta(days=1), "new text"),
            ("http://e.com/b", t, "other"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )
        out = latest_captures(df).toPandas().sort_values("url")
        assert list(out.columns) == ["url", "warc_ts", "text"]
        assert out.text.tolist() == ["new text", "other"]


class TestPipelineCaptureTier:
    def test_capture_dedup_flag(self, spark):
        """With capture_dedup=True, re-crawls of the same canonical URL
        collapse to the latest capture before extraction; with the flag
        off (default) every capture flows through unchanged."""
        from sift_kg_spark.config import DedupConfig
        from sift_kg_spark.pipeline import run_dedup

        t = datetime.datetime(2024, 1, 1)
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = []
        for i in range(6):
            # two captures of the same page: tracking-param spelling at
            # day 0, clean spelling (different text) at day 1
            rows.append(
                (f"http://s.com/p/{i}?utm_source=x", t, f"{base} old{i}")
            )
            rows.append(
                (
                    f"http://s.com/p/{i}",
                    t + datetime.timedelta(days=1),
                    f"{base} new{i}",
                )
            )
        pages = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        ).select(
            "url",
            "warc_ts",
            F.lit(None).cast("binary").alias("html"),
            "text",
            F.lit("en").alias("lang"),
        )

        off = run_dedup(spark, pages, DedupConfig(min_text_chars=10))
        on = run_dedup(
            spark, pages, DedupConfig(min_text_chars=10, capture_dedup=True)
        )
        assert off.assignments.count() == 12
        kept = on.assignments.toPandas()
        assert len(kept) == 6
        # every survivor is the clean day-1 spelling
        assert all("?" not in u for u in kept.url)


class TestCanonicalUrlFuzz:
    def test_matches_independent_python_impl(self, spark):
        """Seeded fuzz: 400 structurally-varied URLs (case mixes, ports,
        empty/duplicate/tracking-only queries, '&&' runs, fragments with
        '?', trailing slashes) canonicalized by the Spark expression
        must equal an independent Python implementation of the same
         5-rule spec (string surgery, no regex engine shared with the
        implementation under test)."""
        import random
        import re as _re

        def py_canonical(u):
            # 1. fragment
            u = u.split("#", 1)[0]
            # 2. lowercase scheme://authority
            m = _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", u)
            if m:
                u = u[: m.end()].lower() + u[m.end():]
            # 3. default ports
            for scheme, port in (("http", ":80"), ("https", ":443")):
                pref = scheme + "://"
                if u.startswith(pref):
                    rest = u[len(pref):]
                    cut = len(rest)
                    for ch in "/?:":
                        p = rest.find(ch)
                        if p != -1:
                            cut = min(cut, p)
                    host, after = rest[:cut], rest[cut:]
                    if after.startswith(port) and (
                        len(after) == len(port)
                        or after[len(port)] in "/?"
                    ):
                        u = pref + host + after[len(port):]
            # 4. query params
            if "?" in u:
                base, qs = u.split("?", 1)
                keep = sorted(
                    p for p in qs.split("&")
                    if p != "" and not _re.match(
                        r"^(utm_[A-Za-z]+|fbclid|gclid|msclkid|ref)=", p)
                )
                u = base + ("?" + "&".join(keep) if keep else "")
            # 5. trailing slash on non-root path
            if "?" in u:
                base, qs = u.split("?", 1)
                tail = "?" + qs
            else:
                base, tail = u, ""
            m = _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", base)
            if m and len(base) > m.end() + 1 and base.endswith("/"):
                base = base[:-1]
            return base + tail

        rng = random.Random(99)
        schemes = ["http://", "HTTP://", "https://", "HTTPS://", "ftp://"]
        hosts = ["e.com", "WWW.E.COM", "Sub.Host.org", "h"]
        ports = ["", ":80", ":443", ":8080"]
        paths = ["", "/", "/a", "/A/b", "/a/", "/a/b/", "/x%20y"]
        queries = ["", "?", "?a=1", "?b=2&a=1", "?utm_source=x",
                   "?utm_source=x&a=1", "?a=1&&b=2", "?ref=t&gclid=1",
                   "?A=1&a=1", "?a=1&a=1"]
        frags = ["", "#f", "#a?b", "#"]
        urls = []
        for _ in range(400):
            urls.append(
                rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
                + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
            )
        df = spark.createDataFrame(pd.DataFrame({"url": urls}))
        got = (
            df.withColumn("c", canonical_url(F.col("url")))
            .toPandas()
        )
        for _, r in got.iterrows():
            assert r["c"] == py_canonical(r["url"]), r["url"]


class TestPipelineQualityGate:
    def test_quality_gate_quarantines(self, spark):
        """quality_gate=True quarantines Gopher-rule failures with
        reason='quality_reject'; the default leaves them in."""
        from sift_kg_spark.config import DedupConfig
        from sift_kg_spark.pipeline import run_dedup

        # must clear the published Gopher stopword rule (>= 2 of the
        # 8-word list): carries "the", "and", "of", "with"
        good = ("the quick brown fox jumps over a lazy dog near the "
                "riverbank while tall trees sway and bend with wind of "
                "early spring mornings " * 2)
        short = "the tiny a page of text here now"   # > min_text_chars,
                                                      # < quality_min_words
        rows = [(f"http://q.com/{i}", good) for i in range(4)]
        rows.append(("http://q.com/short", short))
        pages = spark.createDataFrame(
            rows, "url string, text string"
        ).select(
            "url",
            F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text",
            F.lit("en").alias("lang"),
        )
        off = run_dedup(spark, pages, DedupConfig(min_text_chars=10))
        assert off.assignments.count() == 5
        assert off.quarantine.count() == 0

        on = run_dedup(
            spark,
            pages,
            DedupConfig(
                min_text_chars=10, quality_gate=True, quality_min_words=20
            ),
        )
        assert on.assignments.count() == 4
        quar = on.quarantine.toPandas()
        assert quar.reason.tolist() == ["quality_reject"]
        assert quar.url.tolist() == ["http://q.com/short"]
