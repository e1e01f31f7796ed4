"""Multimodal binary-column plumbing: schema, batching, deterministic fake
features, magic-byte sniffing, and ANN over the feature column. The codec
itself is stubbed (no image/audio libs in this environment) — that stub
boundary is itself under test."""

from __future__ import annotations

import numpy as np
import pytest

from sift_kg_spark.functions import multimodal as M


class TestSniff:
    def test_magic_bytes(self):
        assert M.sniff_type(b"\x89PNG\r\n\x1a\n....") == "image/png"
        assert M.sniff_type(b"\xff\xd8\xff\xe0JFIF") == "image/jpeg"
        assert M.sniff_type(b"ID3\x04rest") == "audio/mp3"
        assert M.sniff_type(b"<html><body>") == "text/html"
        assert M.sniff_type(b"\x00\x01\x02") == "application/octet-stream"
        assert M.sniff_type(None) == "empty"


class TestDecodeStub:
    def test_real_decode_raises(self):
        with pytest.raises(NotImplementedError):
            M.decode_image(b"\x89PNG....")

    def test_fake_decode_deterministic(self):
        a = M.decode_image(b"payload-bytes", fake=True)
        b = M.decode_image(b"payload-bytes", fake=True)
        c = M.decode_image(b"other-bytes", fake=True)
        assert a.shape == (M.FEATURE_DIM,) and a.dtype == np.float32
        assert np.array_equal(a, b)
        assert not np.array_equal(a, c)


class TestSparkPlumbing:
    def test_metadata_over_binary_column(self, spark, pages_df):
        meta = M.extract_metadata(pages_df.limit(200))
        rows = meta.collect()
        assert len(rows) == 200
        types = {r.media_type for r in rows}
        assert "text/html" in types  # html-carrying rows sniffed
        assert "empty" in types      # text-only rows have NULL payload
        html_rows = [r for r in rows if r.media_type == "text/html"]
        assert all(r.n_bytes > 0 for r in html_rows)

    def test_features_and_ann(self, spark, pages_df):
        sample = pages_df.filter("html is not null").limit(40)
        feats = M.extract_features(sample, fake=True).filter(
            "feature is not null"
        ).cache()
        n = feats.count()
        assert n > 10
        queries = feats.limit(3)
        topk = M.cosine_topk(feats, queries, k=5).collect()
        by_q = {}
        for r in topk:
            by_q.setdefault(r.query_url, []).append(r)
        assert len(by_q) == 3
        for rows in by_q.values():
            assert [r.rnk for r in sorted(rows, key=lambda x: x.rnk)] == list(
                range(1, len(rows) + 1)
            )
            cosines = [r.cosine for r in sorted(rows, key=lambda x: x.rnk)]
            assert cosines == sorted(cosines, reverse=True)
            assert all(-1.001 <= c <= 1.001 for c in cosines)
