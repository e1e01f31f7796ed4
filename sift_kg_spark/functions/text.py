"""Text extraction + normalization.

The HTML -> text walk reimplements the reference's extraction semantics
(/root/reference/src/sift_kg/ingest/pdfplumber_extractor.py:125-135:
BeautifulSoup(html.parser); decompose script/style/head;
``get_text(separator="\\n", strip=True)``) as a self-contained
``html.parser.HTMLParser`` subclass, so the byte-identity contract does not
depend on a bs4 version pin (SURVEY.md §7 risk list). The SAME function body
runs inside the Arrow pandas UDF on executors and single-process as the
oracle — byte-identical extracted text per url is therefore testable, not
assumed.

Normalization mirrors the reference's Layer-1 phase-1 key
(/root/reference/src/sift_kg/graph/prededup.py:57-61: unidecode -> lower ->
strip) adapted to page text: NFKD decomposition, then STRIP COMBINING MARKS
ONLY (category Mn) rather than an ascii-ignore byte drop — unidecode
*transliterates*; an ascii-ignore fold would DELETE every CJK / Cyrillic /
Greek / Arabic codepoint, normalizing unrelated non-Latin documents to
near-identical punctuation husks that then mass-false-merge in the
exact-dup stage. Accent variants still fold together (e -> e + U+0301 ->
e), and non-Latin corpora dedup on their real content. Then casefold +
whitespace collapse. Title-prefix stripping and per-word singularization
(prededup.py:30-72) are entity-name-specific and intentionally not applied
to page text.
"""

from __future__ import annotations

import unicodedata
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKIP_TAGS = frozenset({"script", "style", "head"})

# Tags that html.parser knows are void (no closing tag); none affect skip
# state but listed for clarity in handle_startendtag.
_DECODE_ERRORS = "replace"


class _TextWalker(HTMLParser):
    """Visible-text extractor: drop script/style/head subtrees, collect
    stripped non-empty text nodes, join with "\\n" — the bs4
    ``get_text(separator="\\n", strip=True)`` contract."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            stripped = data.strip()
            if stripped:
                self._chunks.append(stripped)

    def text(self) -> str:
        return "\n".join(self._chunks)


def extract_text_py(html: bytes | str | None) -> str | None:
    """Pure-function extraction oracle; also the UDF body.

    utf-8 with latin-1 fallback mirrors the reference's encoding fallback
    (/root/reference/src/sift_kg/ingest/pdfplumber_extractor.py:117-123).
    """
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html)
        try:
            html_str = raw.decode("utf-8")
        except UnicodeDecodeError:
            html_str = raw.decode("latin-1")
    else:
        html_str = html
    walker = _TextWalker()
    try:
        walker.feed(html_str)
        walker.close()
    except Exception:
        # Malformed-markup rows must quarantine, not fail the stage
        # (reference swallows per-doc extraction errors,
        # extract/extractor.py:210-217).
        return None
    return walker.text()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized extraction over the ``html`` binary column."""
    return html.map(extract_text_py)


_MN_TABLE: dict[int, None] | None = None


def _mn_table() -> dict[int, None]:
    """str.translate table deleting every combining mark (category Mn).

    Built lazily once per process (~1s full-plane scan) and reused across
    Arrow batches — Spark reuses Python workers, so the cost amortizes to
    zero on executors.
    """
    global _MN_TABLE
    if _MN_TABLE is None:
        import sys

        _MN_TABLE = {
            cp: None
            for cp in range(sys.maxunicode + 1)
            if unicodedata.category(chr(cp)) == "Mn"
        }
    return _MN_TABLE


def normalize_text_py(text: str | None) -> str | None:
    """NFKD -> strip combining marks -> casefold -> whitespace collapse.

    Keeps non-Latin codepoints (CJK/Cyrillic/Greek/Arabic text survives);
    only the decomposed accents/diacritics are removed, so 'José' and
    'Jose' fold together without deleting scripts the ascii-ignore fold
    would destroy.
    """
    if text is None:
        return None
    if text.isascii():
        # Fast path — bit-identical by construction: NFKD is the
        # identity on ASCII, no ASCII codepoint is category Mn, and
        # casefold() equals lower() on ASCII. Skips the full-plane
        # translate() walk for the overwhelmingly common case (one
        # C-level isascii() scan instead).
        return " ".join(text.lower().split())
    folded = unicodedata.normalize("NFKD", text).translate(_mn_table())
    return " ".join(folded.casefold().split())


@F.pandas_udf(T.StringType())
def normalize_text_udf(text: pd.Series) -> pd.Series:
    # The SAME function body as the single-process oracle — parity by
    # construction (unicodedata calls are C-implemented; pandas object-
    # dtype str ops are per-element loops anyway, so .map costs the same).
    return text.map(normalize_text_py)


# explicit StructType: a DDL string here would need an active
# SparkContext at import time (module-level decorator)
_EXTRACT_NORM_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("text_norm", T.StringType()),
    ]
)


@F.pandas_udf(_EXTRACT_NORM_SCHEMA)
def extract_normalize_udf(html: pd.Series, text: pd.Series) -> pd.DataFrame:
    """Fused extraction + normalization (guide §4.1): one Python round
    trip instead of two chained ArrowEvalPython passes, each of which
    shipped the full corpus text across the JVM boundary. Semantics are
    exactly ``coalesce(text, extract_text_py(html))`` followed by
    ``normalize_text_py`` — the same function bodies the oracle runs —
    and extraction is only invoked for rows whose ``text`` is NULL
    (identical to coalesce, just without evaluating the UDF on rows
    that discard it)."""
    out_t: list[str | None] = []
    out_n: list[str | None] = []
    for h, t in zip(html, text):
        tt = t if isinstance(t, str) else extract_text_py(h)
        out_t.append(tt)
        out_n.append(normalize_text_py(tt))
    return pd.DataFrame({"text": out_t, "text_norm": out_n})
