"""Suffix-array exact-substring confirmation (gray-zone Layer-2 judge #3).

Semantics map to the reference's transitive-redundancy removal
(/root/reference/src/sift_kg/graph/postprocessor.py:101-127 — an edge is
redundant when implied by a longer path): a page pair whose texts share a
long exact byte span (>= cfg.min_span_bytes) is a duplicate even when
token-level Jaccard sits in the gray zone (containment: one page embeds the
other's content among extra paragraphs).

Implementation: per pair, build a suffix array over ``a + <sep> + b``
where ``<sep>`` is the out-of-band value 256 in an int32 widening of the
byte arrays (a literal U+0001 in the text encodes as byte 0x01, so no
BYTE separator is collision-free; the 256 sentinel cannot equal any text
position and a cross-pair LCP can never run through it), prefix-doubling
construction
(O(n log n), fully numpy-vectorized via np.lexsort). The LCP step is NOT
Kasai (a per-character Python loop — the round-1 scale-killer): instead the
rank arrays that prefix doubling already produces at every level are kept,
and the LCP of ALL adjacent suffix pairs is computed simultaneously with a
vectorized sparse walk — at level k, pairs whose next 2^k-byte blocks have
equal rank advance by 2^k. Exact (no hashing), O(log n) numpy passes total,
no per-character Python anywhere.

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
from sift_kg_spark.functions.hashing import mix64

SPAN_SCHEMA = "uid_a long, uid_b long, span int"

# Rolling-hash constant (odd -> invertible mod 2^64).
_RH_C = 0x9E3779B97F4A7C15
# Newton iteration for the inverse of an odd c mod 2^64: x <- x(2 - cx).
_RH_CINV = pow(_RH_C, -1, 1 << 64)


def _window_hashes(s: np.ndarray, w: int) -> np.ndarray:
    """mix64 of the degree-(w-1) polynomial hash of every w-byte window.

    O(n) vector ops via prefix sums in the 2^64 wrap ring:
    P[i] = sum_{j<i} s[j]*c^j;  V(i) = (P[i+w]-P[i]) * c^{-i}.
    Equal windows ALWAYS hash equal (the screen has no false negatives);
    collisions only cost a wasted exact-path run.
    """
    n = len(s)
    if n < w or w <= 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pows = np.empty(n, dtype=np.uint64)
        pows[0] = 1
        if n > 1:
            np.multiply.accumulate(
                np.full(n - 1, _RH_C, dtype=np.uint64), out=pows[1:]
            )
        cinv_pows = np.empty(n - w + 1, dtype=np.uint64)
        cinv_pows[0] = 1
        if n - w > 0:
            np.multiply.accumulate(
                np.full(n - w, _RH_CINV, dtype=np.uint64), out=cinv_pows[1:]
            )
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(s.astype(np.uint64) * pows, out=prefix[1:])
        v = (prefix[w:] - prefix[:-w]) * cinv_pows
    return mix64(v)


def has_common_window(ab: bytes, bb: bytes, w: int) -> bool:
    """True iff a and b share some exact w-byte substring (no false
    negatives; rare hash-collision false positives are caught by the exact
    suffix-array pass that follows a positive screen)."""
    ha = _window_hashes(np.frombuffer(ab, dtype=np.uint8), w)
    hb = _window_hashes(np.frombuffer(bb, dtype=np.uint8), w)
    if len(ha) == 0 or len(hb) == 0:
        return False
    if len(hb) < len(ha):
        ha, hb = hb, ha
    ha = np.sort(ha)
    idx = np.searchsorted(ha, hb)
    idx[idx == len(ha)] = len(ha) - 1
    return bool((ha[idx] == hb).any())


def _build(s: np.ndarray) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Prefix-doubling suffix array of an integer array, keeping every
    level (uint8 text bytes or the int32 sentinel-widened concatenation).

    Returns (sa, rank, levels): sa[i] = start of i-th smallest suffix;
    rank = final ranks; levels[k][p] = rank of the 2^k-byte block starting
    at p (int32 — the blocks-equal oracle the LCP walk compares against).
    """
    n = len(s)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, [np.empty(0, dtype=np.int32)]
    rank = s.astype(np.int64)
    levels = [rank.astype(np.int32)]
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
        levels.append(rank.astype(np.int32))
        if new_rank_sorted[-1] == n - 1 or k >= n:
            break
        k *= 2
    return sa, rank, levels


def suffix_array(s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Prefix-doubling suffix array of a uint8 array.

    Returns (sa, rank): sa[i] = start of i-th smallest suffix;
    rank[pos] = lexicographic rank of the suffix starting at pos.
    """
    sa, rank, _ = _build(s)
    return sa, rank


def pair_lcp(
    levels: list[np.ndarray], i: np.ndarray, j: np.ndarray, n: int
) -> np.ndarray:
    """Exact LCP of suffix pairs (i[t], j[t]), vectorized over all pairs.

    Sparse walk over the doubling levels, highest block size first: a pair
    advances by 2^k when its next 2^k-byte blocks both fit and have equal
    level-k rank (rank equality <=> block equality for fully in-bounds
    blocks). The construction stops only once every rank is distinct, so
    for DISTINCT suffixes the true LCP is < 2^top and the greedy descent
    is exact; identical pairs (i == j) exceed that capacity and are
    answered directly as n - i.
    """
    m = len(i)
    lcp = np.zeros(m, dtype=np.int64)
    if m == 0:
        return lcp
    i = i.astype(np.int64)
    j = j.astype(np.int64)
    same = i == j
    for k in range(len(levels) - 1, -1, -1):
        step = np.int64(1 << k)
        lev = levels[k]
        ri = i + lcp
        rj = j + lcp
        ok = (ri + step <= n) & (rj + step <= n)
        if not ok.any():
            continue
        eq = np.zeros(m, dtype=bool)
        eq[ok] = lev[ri[ok]] == lev[rj[ok]]
        lcp[eq] += step
    if same.any():
        lcp[same] = n - i[same]
    return lcp


def lcp_array(
    s: np.ndarray, sa: np.ndarray, rank: np.ndarray
) -> np.ndarray:
    """lcp[r] = LCP(suffix sa[r-1], suffix sa[r]); lcp[0] = 0.

    Vectorized replacement for Kasai: one sparse walk over ALL adjacent
    suffix-array pairs at once (``rank`` kept in the signature for drop-in
    compatibility; the walk re-derives the doubling levels).
    """
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    _, _, levels = _build(s)
    lcp[1:] = pair_lcp(levels, sa[:-1], sa[1:], n)
    return lcp


def longest_common_span(a: str, b: str, cap: int = 2_000_000) -> int:
    """Length in bytes of the longest exact substring shared by a and b."""
    if not a or not b:
        return 0
    ab = a.encode("utf-8", "ignore")[:cap]
    bb = b.encode("utf-8", "ignore")[:cap]
    # Out-of-band separator: normalized text may legitimately contain any
    # BYTE (a literal U+0001 utf-8-encodes as 0x01), so no byte value is
    # collision-free. Widening to int32 buys a true sentinel (256) that no
    # text position can equal — a cross-pair LCP can then never run
    # through the boundary, and the construction works unchanged (ranks
    # are value-agnostic).
    s = np.concatenate(
        [
            np.frombuffer(ab, dtype=np.uint8).astype(np.int32),
            np.array([256], dtype=np.int32),
            np.frombuffer(bb, dtype=np.uint8).astype(np.int32),
        ]
    )
    boundary = len(ab)  # index of the separator
    sa, _rank, levels = _build(s)
    side = sa < boundary  # suffixes starting in a (separator counts as b-side)
    cross = side[1:] != side[:-1]
    if not cross.any():
        return 0
    # LCP only for boundary-crossing adjacent pairs — the classic
    # longest-common-substring-via-suffix-array reduction.
    lo = sa[:-1][cross]
    hi = sa[1:][cross]
    return int(pair_lcp(levels, lo, hi, len(s)).max())


def confirm_spans(
    flagged_with_texts: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(uid_a, uid_b, span) for flagged pairs, via mapInPandas.

    Input columns: uid_a, uid_b, text_a, text_b (normalized texts).

    Two-tier per pair: an O(n) rolling-hash window screen first — the
    typical flagged-junk pair shares NO ``min_span_bytes`` window, so the
    O(n log n) suffix-array construction is skipped entirely (the round-1
    hot spot). Screen-positive pairs get the exact suffix-array span.
    Screen-negative pairs report span 0: the only consumer is the
    ``span >= min_span_bytes`` confirm gate, and the screen has no false
    negatives, so sub-threshold exact spans are never needed.
    """
    cap = cfg.max_span_doc_bytes
    min_span = cfg.min_span_bytes

    def _span(ta: str | None, tb: str | None) -> int:
        if not ta or not tb:
            return 0
        ab = ta.encode("utf-8", "ignore")[:cap]
        bb = tb.encode("utf-8", "ignore")[:cap]
        if not has_common_window(ab, bb, min_span):
            return 0
        return longest_common_span(ta, tb, cap)

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            spans = [
                _span(ta, tb)
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
