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
strip) adapted to page text: NFKD ASCII fold (unidecode is not available and
targets entity names; documented divergence per SURVEY.md §7), casefold,
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


def normalize_text_py(text: str | None) -> str | None:
    """NFKD ASCII fold + casefold + whitespace collapse + strip."""
    if text is None:
        return None
    folded = (
        unicodedata.normalize("NFKD", text).encode("ascii", "ignore").decode("ascii")
    )
    return " ".join(folded.casefold().split())


@F.pandas_udf(T.StringType())
def normalize_text_udf(text: pd.Series) -> pd.Series:
    # Vectorized pandas string ops where possible; the NFKD fold needs the
    # per-element unicodedata call (C-implemented).
    def _fold(s: str | None) -> str | None:
        if s is None:
            return None
        return (
            unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")
        )

    folded = text.map(_fold)
    return (
        folded.str.casefold()
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )
