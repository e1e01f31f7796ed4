"""Suffix-array stage: construction verified against a naive oracle
(property-based via hypothesis), Kasai LCP, and the longest-common-span
semantics the containment class (D5) depends on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sift_kg_spark.operators.suffix import (
    lcp_array,
    longest_common_span,
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
        def brute(x: str, y: str) -> int:
            best = 0
            for i in range(len(x)):
                for j in range(len(y)):
                    k = 0
                    while i + k < len(x) and j + k < len(y) and x[i + k] == y[j + k]:
                        k += 1
                    best = max(best, k)
            return best

        assert longest_common_span(a, b) == brute(a, b)
