"""Hypothesis property tests for the signature kernels (r3 VERDICT #8
follow-through: the jaccard kernel got a set oracle in test_operators;
here the remaining load-bearing numpy kernels get independent oracles).

Each oracle is a deliberate re-implementation on a different arithmetic
path — pure Python ints mod 2**64 per doc — so a vectorization bug
(wrong reduceat offsets, boundary bleed, wraparound mishandling) cannot
cancel out of both sides. No Spark session needed: these call the numpy
kernels directly, exactly as the Arrow batch path does.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sift_kg_spark.functions import hashing as H

MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# pure-Python oracles


def _py_mix64(v: int) -> int:
    """splitmix64 finalizer on Python ints (independent of numpy uint64)."""
    v &= MASK64
    v ^= v >> 30
    v = (v * 0xBF58476D1CE4E5B9) & MASK64
    v ^= v >> 27
    v = (v * 0x94D049BB133111EB) & MASK64
    v ^= v >> 31
    return v


_PY_POLY_C = 0x9E3779B97F4A7C15


def _py_shingles(tokens: list[int], k: int) -> list[int]:
    """Per-doc oracle for shingle_sets: degree-k polynomial windows (or the
    length-tagged whole-doc shingle when shorter than k), mixed, sorted
    unique — all in Python ints."""
    n = len(tokens)
    if n == 0:
        return []
    if n >= k:
        out = []
        for pos in range(n - k + 1):
            acc, c = 0, 1
            for j in range(k):
                acc = (acc + tokens[pos + j] * c) & MASK64
                c = (c * _PY_POLY_C) & MASK64
            out.append(_py_mix64(acc))
    else:
        acc, c = 0, 1
        for t in tokens:
            acc = (acc + t * c) & MASK64
            c = (c * _PY_POLY_C) & MASK64
        out = [_py_mix64(acc ^ n)]
    return sorted(set(out))


def _py_simhash(tokens: list[int]) -> int:
    """Per-doc oracle for simhash64: bit b set iff a strict majority of
    token hashes have bit b set (ties -> 0)."""
    n = len(tokens)
    if n == 0:
        return 0
    out = 0
    for b in range(64):
        ones = sum((t >> b) & 1 for t in tokens)
        if 2 * ones > n:
            out |= 1 << b
    return out


# ---------------------------------------------------------------------------
# strategies: ragged batches of uint64 token hashes

_tok = st.integers(min_value=0, max_value=MASK64)
_doc = st.lists(_tok, min_size=0, max_size=30)
_batch = st.lists(_doc, min_size=0, max_size=12)


def _pack(docs: list[list[int]]) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    flat = np.array(
        [t for d in docs for t in d], dtype=np.uint64
    ) if offsets[-1] else np.empty(0, dtype=np.uint64)
    return flat, offsets


class TestShingleSetsProperty:
    @settings(max_examples=200, deadline=None)
    @given(_batch, st.integers(min_value=1, max_value=6))
    def test_matches_python_oracle(self, docs, k):
        flat, offsets = _pack(docs)
        got = H.shingle_sets(flat, offsets, k)
        assert len(got) == len(docs)
        for g, d in zip(got, docs):
            assert g.tolist() == _py_shingles(d, k)

    @settings(max_examples=100, deadline=None)
    @given(_batch, st.integers(min_value=1, max_value=6))
    def test_boundary_isolation(self, docs, k):
        """Each doc's shingles are independent of batch composition."""
        flat, offsets = _pack(docs)
        whole = H.shingle_sets(flat, offsets, k)
        for i, d in enumerate(docs):
            f1, o1 = _pack([d])
            alone = H.shingle_sets(f1, o1, k)[0]
            assert whole[i].tolist() == alone.tolist()


class TestSimHashProperty:
    @settings(max_examples=200, deadline=None)
    @given(_batch)
    def test_matches_python_oracle(self, docs):
        flat, offsets = _pack(docs)
        got = H.simhash64(flat, offsets)
        assert len(got) == len(docs)
        for g, d in zip(got, docs):
            assert int(g) == _py_simhash(d)


class TestMinHashProperty:
    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(st.sets(_tok, max_size=25), min_size=0, max_size=8),
        st.integers(min_value=1, max_value=16),
        st.integers(min_value=0, max_value=2**31),
    )
    def test_union_is_elementwise_min(self, sets, num_perm, seed):
        """The defining MinHash identity: sig(A | B) == min(sig(A), sig(B))
        per permutation — catches any per-permutation offset/remix bug."""
        seeds = H.perm_seeds(num_perm, seed)
        arrs = [np.array(sorted(s), dtype=np.uint64) for s in sets]
        sig = H.minhash_signatures(arrs, seeds)
        assert sig.shape == (len(sets), num_perm)
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                u = np.array(sorted(sets[i] | sets[j]), dtype=np.uint64)
                su = H.minhash_signatures([u], seeds)[0]
                assert (
                    su == np.minimum(sig[i], sig[j])
                ).all() or not (sets[i] or sets[j])

    def test_empty_set_sentinel(self):
        seeds = H.perm_seeds(8, 7)
        sig = H.minhash_signatures(
            [np.empty(0, dtype=np.uint64), np.array([3], dtype=np.uint64)],
            seeds,
        )
        assert (sig[0] == np.iinfo(np.uint64).max).all()
        assert (sig[1] != np.iinfo(np.uint64).max).any()


class TestChunkPairPigeonholeProperty:
    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=MASK64),
        st.sets(st.integers(min_value=0, max_value=63), max_size=2),
    )
    def test_hamming_le_2_shares_a_pair_key(self, sim, flip_bits):
        """The guarantee explode_keys relies on: for 4 chunks, any pair at
        Hamming distance <= 2 shares >= 1 of the C(4,2) chunk-pair keys —
        for EVERY placement of the differing bits, not just sampled ones."""
        other = sim
        for b in flip_bits:
            other ^= 1 << b
        c1 = H.simhash_chunks(np.array([sim], dtype=np.uint64), 4)[0]
        c2 = H.simhash_chunks(np.array([other], dtype=np.uint64), 4)[0]
        assert (c1 == c2).any()
