"""Extraction + normalization unit tests.

Mirrors the reference's extraction/normalization case matrix
(/root/reference/tests/test_prededup.py:15-39 normalization cases;
tests/test_ingest.py HTML extraction) adapted to the webtext payload,
plus the byte-identity invariant: Spark UDF output == single-process
oracle output for every html-carrying row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sift_kg_spark.functions.text import (
    extract_text_py,
    extract_text_udf,
    normalize_text_py,
)


class TestExtractText:
    def test_strips_script_style_head(self):
        html = (
            b"<html><head><title>T</title><style>x{}</style></head>"
            b"<body><script>var a=1;</script><p>Hello</p>"
            b"<style>.y{}</style><p>World</p></body></html>"
        )
        assert extract_text_py(html) == "Hello\nWorld"

    def test_separator_and_strip_semantics(self):
        # bs4 get_text(separator="\n", strip=True): each text node stripped,
        # empties dropped, joined with newline.
        html = b"<body><p>  a  </p>\n\n  <div> b <span>c</span></div></body>"
        assert extract_text_py(html) == "a\nb\nc"

    def test_charref_decoding(self):
        assert extract_text_py(b"<p>a &amp; b &#233;</p>") == "a & b \xe9"

    def test_nested_skip_tags(self):
        html = b"<head><script>s</script>skip me</head><p>keep</p>"
        assert extract_text_py(html) == "keep"

    def test_latin1_fallback(self):
        # invalid utf-8 byte -> latin-1 decode (reference encoding fallback)
        html = "<p>caf\xe9</p>".encode("latin-1")
        assert extract_text_py(html) == "caf\xe9"

    def test_none_passthrough(self):
        assert extract_text_py(None) is None

    def test_str_input(self):
        assert extract_text_py("<p>x</p>") == "x"


class TestNormalize:
    def test_unicode_fold(self):
        # test_prededup.py:18-19 — José García -> jose garcia
        assert normalize_text_py("Jos\xe9 Garc\xeda") == "jose garcia"

    def test_case_and_whitespace(self):
        assert normalize_text_py("  HeLLo \n\t WORLD  ") == "hello world"

    def test_accent_variants_fold_equal(self):
        assert normalize_text_py("C\xc1F\xc9 r\xe9sum\xe9") == normalize_text_py(
            "cafe resume"
        )

    def test_none(self):
        assert normalize_text_py(None) is None

    def test_non_latin_scripts_preserved(self):
        # Regression (round-1 advice): the old ascii-ignore fold deleted
        # every CJK/Cyrillic codepoint, so unrelated non-Latin documents
        # normalized to identical punctuation husks and mass false-merged.
        zh_a = "中文网页内容, 第一页."
        zh_b = "完全不同的文章, 第二篇."
        na, nb = normalize_text_py(zh_a), normalize_text_py(zh_b)
        assert na != nb
        assert len(na) > 5 and len(nb) > 5
        ru = normalize_text_py("Привет Мир")
        assert "привет" in ru  # casefolded, kept

    def test_combining_marks_stripped_accents_fold(self):
        # e + COMBINING ACUTE == precomposed é == plain e after the fold
        assert normalize_text_py("café") == normalize_text_py("café")
        assert normalize_text_py("café") == "cafe"


class TestByteIdentity:
    def test_spark_udf_matches_oracle(self, spark, corpus):
        """The invariant from BASELINE.json input_hint: byte-identical
        extracted text per url, Spark UDF vs single-process oracle."""
        pages_pdf = corpus[0]
        html_rows = pages_pdf[pages_pdf.html.notna()][["url", "html"]]
        assert len(html_rows) > 50
        df = spark.createDataFrame(html_rows)
        extracted = {
            r["url"]: r["t"]
            for r in df.select("url", extract_text_udf("html").alias("t")).collect()
        }
        truth = dict(
            zip(
                pages_pdf[pages_pdf.html.notna()].url,
                pages_pdf[pages_pdf.html.notna()].true_text,
            )
        )
        mismatches = [u for u in truth if extracted[u] != truth[u]]
        assert mismatches == []

    def test_udf_normalize_matches_py(self, spark):
        from sift_kg_spark.functions.text import normalize_text_udf

        rows = [
            ("a", "Jos\xe9  Garc\xeda "),
            ("b", "MiXeD \n CASE"),
            ("c", None),
            ("d", "caf\xe9 Über ẞ"),
        ]
        df = spark.createDataFrame(rows, "url string, text string")
        got = {
            r["url"]: r["n"]
            for r in df.select("url", normalize_text_udf("text").alias("n")).collect()
        }
        for url, text in rows:
            assert got[url] == normalize_text_py(text), url
