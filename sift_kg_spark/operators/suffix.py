"""Suffix-array exact-substring confirmation (gray-zone Layer-2 judge #3).

Semantics map to the reference's transitive-redundancy removal
(/root/reference/src/sift_kg/graph/postprocessor.py:101-127 — an edge is
redundant when implied by a longer path): a page pair whose texts share a
long exact byte span (>= cfg.min_span_bytes) is a duplicate even when
token-level Jaccard sits in the gray zone (containment: one page embeds the
other's content among extra paragraphs).

Implementation: per pair, build a suffix array over ``a + \\x01 + b``
(normalized text is ASCII after the NFKD fold, so 0x01 never collides),
prefix-doubling construction (O(n log n), fully numpy-vectorized via
np.lexsort), Kasai LCP, and take the max LCP between adjacent suffixes that
start on opposite sides of the separator — the classic longest-common-
substring-via-suffix-array algorithm.

This stage runs ONLY on flagged pairs (gray zone after Jaccard + SimHash),
via ``mapInPandas`` — a narrow per-batch operator, no extra shuffle beyond
the text joins the pipeline already does.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sift_kg_spark.config import DedupConfig

SPAN_SCHEMA = "uid_a long, uid_b long, span int"


def suffix_array(s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Prefix-doubling suffix array of a uint8 array.

    Returns (sa, rank): sa[i] = start of i-th smallest suffix;
    rank[pos] = lexicographic rank of the suffix starting at pos.
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rank = s.astype(np.int64)
    k = 1
    sa = np.argsort(rank, kind="stable")
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        sa = np.lexsort((key2, rank))
        r1 = rank[sa]
        r2 = key2[sa]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank_sorted = np.cumsum(changed) - 1
        rank = np.empty(n, dtype=np.int64)
        rank[sa] = new_rank_sorted
        if new_rank_sorted[-1] == n - 1 or k >= n:
            break
        k *= 2
    return sa, rank


def lcp_array(s: np.ndarray, sa: np.ndarray, rank: np.ndarray) -> np.ndarray:
    """Kasai: lcp[r] = LCP(suffix sa[r-1], suffix sa[r]); lcp[0] = 0."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            m = n - max(i, j)
            while h < m and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_span(a: str, b: str, cap: int = 2_000_000) -> int:
    """Length in bytes of the longest exact substring shared by a and b."""
    if not a or not b:
        return 0
    ab = a.encode("utf-8", "ignore")[:cap]
    bb = b.encode("utf-8", "ignore")[:cap]
    s = np.frombuffer(ab + b"\x01" + bb, dtype=np.uint8)
    boundary = len(ab)  # index of the separator
    sa, rank = suffix_array(s)
    lcp = lcp_array(s, sa, rank)
    side = sa < boundary  # suffixes starting in a (separator counts as b-side)
    cross = np.empty(len(s), dtype=bool)
    cross[0] = False
    cross[1:] = side[1:] != side[:-1]
    if not cross.any():
        return 0
    return int(lcp[cross].max())


def confirm_spans(
    flagged_with_texts: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(uid_a, uid_b, span) for flagged pairs, via mapInPandas.

    Input columns: uid_a, uid_b, text_a, text_b (normalized texts).
    """
    cap = cfg.max_span_doc_bytes

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            spans = [
                longest_common_span(ta, tb, cap)
                for ta, tb in zip(pdf["text_a"], pdf["text_b"])
            ]
            yield pd.DataFrame(
                {
                    "uid_a": pdf["uid_a"],
                    "uid_b": pdf["uid_b"],
                    "span": pd.array(spans, dtype="int32"),
                }
            )

    return flagged_with_texts.mapInPandas(_op, schema=SPAN_SCHEMA)
