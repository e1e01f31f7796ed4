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
    @pytest.mark.skipif(
        M.HAS_PIL, reason="real codec installed; stub path not reachable"
    )
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


class TestResizeStub:
    @pytest.mark.skipif(
        M.HAS_PIL, reason="real codec installed; stub path not reachable"
    )
    def test_real_resize_raises(self):
        with pytest.raises(NotImplementedError):
            M.resize_image(b"\x89PNG...." * 600)  # over the byte budget

    def test_fake_resize_deterministic_and_bounded(self):
        big = bytes(range(256)) * 64          # 16 KiB
        a = M.resize_image(big, max_bytes=1000, fake=True)
        b = M.resize_image(big, max_bytes=1000, fake=True)
        assert a == b
        assert 0 < len(a) <= 1000
        small = b"tiny"
        assert M.resize_image(small, max_bytes=1000, fake=True) == small

    def test_resize_batch_plumbing(self, spark, pages_df):
        sample = pages_df.filter("html is not null").limit(30)
        out = M.resize_payloads(sample, max_bytes=512).collect()
        assert len(out) == 30
        for r in out:
            assert r.n_bytes_out <= max(512, r.n_bytes_in)
            assert r.n_bytes_out == len(r.resized)
            assert r.n_bytes_in >= r.n_bytes_out


class TestFrameSampling:
    @pytest.mark.skipif(
        M.HAS_AV and M.HAS_PIL,
        reason="real codecs installed; stub path not reachable",
    )
    def test_real_sampling_raises(self):
        with pytest.raises(NotImplementedError):
            M.sample_frames(b"\x1a\x45\xdf\xa3....")

    def test_fake_frames_deterministic_even_spacing(self):
        payload = bytes(range(256)) * 32      # 8 KiB -> 8 fake frames
        a = M.sample_frames(payload, n_frames=4, fake=True)
        b = M.sample_frames(payload, n_frames=4, fake=True)
        assert len(a) == 4
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
        assert all(v.shape == (M.FEATURE_DIM,) for v in a)
        # distinct sampled frames must differ (seeded by slice + index)
        assert not np.array_equal(a[0], a[1])
        # short payload: fewer fake frames than requested
        short = M.sample_frames(b"x" * 2000, n_frames=4, fake=True)
        assert len(short) == 2000 // M._FAKE_BYTES_PER_FRAME

    def test_frame_table_plumbing(self, spark, pages_df):
        from pyspark.sql import functions as F

        sample = pages_df.filter("html is not null").limit(20)
        frames = M.sample_video_frames(sample, n_frames=3)
        rows = frames.collect()
        assert rows, "html payloads must yield fake frames"
        by_url = {}
        for r in rows:
            by_url.setdefault(r.url, []).append(r.frame_idx)
            assert len(r.frame_feature) == M.FEATURE_DIM
        for idxs in by_url.values():
            assert sorted(idxs) == list(range(len(idxs)))  # 0..n-1 per url
            assert len(idxs) <= 3
        # null payloads emit no rows
        n_null = M.sample_video_frames(
            pages_df.filter("html is null").limit(10)
        ).count()
        assert n_null == 0


@pytest.mark.skipif(
    not M.HAS_PIL, reason="PIL not installed (codec-free sandbox)"
)
class TestRealImageCodecPath:
    """Exercises the optional-import real codec seam. Skipped here (no
    image libs in this sandbox); runs wherever PIL is installed, with the
    fake-path tests above unchanged either way."""

    def _png(self, side: int = 32) -> bytes:
        import io

        from PIL import Image

        img = Image.new("RGB", (side, side))
        img.putdata(
            [(x % 256, (x * 7) % 256, (x * 13) % 256) for x in range(side * side)]
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def test_decode_real_deterministic(self):
        payload = self._png()
        a = M.decode_image(payload)
        b = M.decode_image(payload)
        assert a.shape == (M.FEATURE_DIM,) and a.dtype == np.float32
        assert np.array_equal(a, b)
        assert (a >= 0).all() and (a <= 1).all()

    def test_resize_real_fits_budget(self):
        payload = self._png(side=128)
        assert len(payload) > 400
        out = M.resize_image(payload, max_bytes=400)
        assert 0 < len(out) <= 400
        # already-fitting payloads pass through byte-identically
        small = self._png(side=4)
        assert M.resize_image(small, max_bytes=1 << 20) == small


@pytest.mark.skipif(
    not (M.HAS_AV and M.HAS_PIL),
    reason="PyAV/PIL not installed (codec-free sandbox)",
)
class TestRealVideoCodecPath:
    def test_sample_frames_real(self):
        import io

        import av
        from PIL import Image

        buf = io.BytesIO()
        with av.open(buf, "w", format="mp4") as container:
            stream = container.add_stream("mpeg4", rate=4)
            stream.width, stream.height = 32, 32
            for i in range(8):
                img = Image.new("RGB", (32, 32), (i * 30 % 256, 0, 0))
                frame = av.VideoFrame.from_image(img)
                for packet in stream.encode(frame):
                    container.mux(packet)
            for packet in stream.encode():
                container.mux(packet)
        feats = M.sample_frames(buf.getvalue(), n_frames=3)
        assert 0 < len(feats) <= 3
        assert all(v.shape == (M.FEATURE_DIM,) for v in feats)
