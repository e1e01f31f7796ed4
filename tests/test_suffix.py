"""Suffix-array stage: construction verified against a naive oracle
(property-based via hypothesis), Kasai LCP, and the longest-common-span
semantics the containment class (D5) depends on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sift_kg_spark.operators.suffix import (
    _build,
    lcp_array,
    longest_common_span,
    pair_lcp,
    suffix_array,
)


def _naive_sa(s: bytes) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


class TestSuffixArray:
    @given(st.binary(min_size=0, max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_matches_naive(self, s: bytes):
        arr = np.frombuffer(s, dtype=np.uint8)
        sa, _rank = suffix_array(arr)
        assert sa.tolist() == _naive_sa(s)

    @given(st.binary(min_size=2, max_size=120))
    @settings(max_examples=100, deadline=None)
    def test_kasai_lcp(self, s: bytes):
        arr = np.frombuffer(s, dtype=np.uint8)
        sa, rank = suffix_array(arr)
        lcp = lcp_array(arr, sa, rank)
        for r in range(1, len(s)):
            a, b = s[sa[r - 1]:], s[sa[r]:]
            true_lcp = 0
            for x, y in zip(a, b):
                if x != y:
                    break
                true_lcp += 1
            assert lcp[r] == true_lcp

    def test_repetitive_input(self):
        s = b"abababababab"
        arr = np.frombuffer(s, dtype=np.uint8)
        sa, _ = suffix_array(arr)
        assert sa.tolist() == _naive_sa(s)


class TestLongestCommonSpan:
    def test_known_span(self):
        a = "xxxx SHARED COMMON SPAN HERE yyyy"
        b = "zzzz SHARED COMMON SPAN HERE wwww"
        assert longest_common_span(a, b) == len(" SHARED COMMON SPAN HERE ")

    def test_containment(self):
        core = "the quick brown fox jumps over the lazy dog " * 8
        b = "prefix stuff. " + core + " suffix stuff."
        assert longest_common_span(core, b) == len(core)

    def test_disjoint(self):
        assert longest_common_span("aaaa bbbb", "cccc dddd") <= 1

    def test_empty(self):
        assert longest_common_span("", "anything") == 0

    @given(st.text(alphabet="abc ", min_size=0, max_size=60),
           st.text(alphabet="abc ", min_size=0, max_size=60))
    @settings(max_examples=60, deadline=None)
    def test_matches_bruteforce(self, a: str, b: str):
        assert longest_common_span(a, b) == _brute_lcs(a, b)

    def test_separator_byte_in_text(self):
        # Normalized text can contain a literal U+0001 (= the old 0x01
        # separator byte). Pre-fix, the cross-pair LCP ran THROUGH the
        # separator and over-counted: here the true longest common
        # substring is "CAT" (3), but the naive concatenation sees
        # "CAT\x01CAT" (7) spanning the boundary.
        assert longest_common_span("CAT", "CAT\x01CATX") == 3
        # \x01 as genuine shared content still matches exactly
        assert longest_common_span("a\x01b\x01c", "z a\x01b\x01c q") == 5

    @given(st.text(alphabet="ab\x01", min_size=0, max_size=40),
           st.text(alphabet="ab\x01", min_size=0, max_size=40))
    @settings(max_examples=120, deadline=None)
    def test_bruteforce_with_separator_bytes(self, a: str, b: str):
        assert longest_common_span(a, b) == _brute_lcs(a, b)


def _brute_lcs(x: str, y: str) -> int:
    best = 0
    for i in range(len(x)):
        for j in range(len(y)):
            k = 0
            while i + k < len(x) and j + k < len(y) and x[i + k] == y[j + k]:
                k += 1
            best = max(best, k)
    return best


class TestPairLcp:
    """VERDICT r2 #8: the doubling-level LCP walk is load-bearing —
    fuzz it against a brute-force LCP over ARBITRARY suffix pairs (not
    just SA-adjacent ones, which lcp_array already pins)."""

    @given(st.binary(min_size=1, max_size=150), st.data())
    @settings(max_examples=150, deadline=None)
    def test_arbitrary_pairs_match_bruteforce(self, s: bytes, data):
        n = len(s)
        arr = np.frombuffer(s, dtype=np.uint8)
        _sa, _rank, levels = _build(arr)
        m = data.draw(st.integers(min_value=1, max_value=8))
        i = np.array(
            data.draw(st.lists(st.integers(0, n - 1), min_size=m, max_size=m)),
            dtype=np.int64,
        )
        j = np.array(
            data.draw(st.lists(st.integers(0, n - 1), min_size=m, max_size=m)),
            dtype=np.int64,
        )
        got = pair_lcp(levels, i, j, n)
        for t in range(m):
            a, b = s[i[t]:], s[j[t]:]
            true_lcp = 0
            for x, y in zip(a, b):
                if x != y:
                    break
                true_lcp += 1
            assert got[t] == true_lcp, (s, i[t], j[t])
