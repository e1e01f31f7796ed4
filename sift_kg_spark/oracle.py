"""Single-process oracle of the full dedup decision procedure.

Re-implements the ENTIRE pipeline (extract -> normalize -> quarantine ->
exact dedup -> packed-key blocking -> hot-bucket star -> Jaccard/SimHash/
suffix verify -> threshold split -> union-find transitive closure ->
A1 canonical rule) with plain pandas/numpy — reusing the exact same
signature and text functions the Spark engine uses, plus a pure-Python
XXH64 (seed 42) so doc_uid-dependent choices (bucket star centers, pair
orientation) match Spark bit-for-bit.

This is the operational form of the recall clause in BASELINE.json: the
reference's Layer-1..4 workflow, reduced to deterministic rules "at the
same shingle/signature config", evaluated without any distribution. The
parity test (tests/test_oracle_parity.py) asserts the Spark pipeline's
cluster assignments and pair decisions EQUAL the oracle's — strictly
stronger than the >= 0.99 recall gate.

Scale note: the oracle is O(corpus) in driver memory by design — it
exists to define ground truth for test corpora, not to run at 10^12 docs.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from sift_kg_spark.config import DEFAULT_CONFIG, DedupConfig
from sift_kg_spark.functions.features import compute_features_pdf
from sift_kg_spark.functions.text import extract_text_py, normalize_text_py
from sift_kg_spark.operators.suffix import longest_common_span

# --------------------------------------------------------------------------
# XXH64 (public algorithm; Spark's xxhash64 = XXH64(utf8 bytes, seed=42))
# --------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64, returned as a SIGNED 64-bit int (Spark's LongType view)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i : i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i : i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i : i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# --------------------------------------------------------------------------
# union-find (Layer-4 transitive closure, apply_merges fixpoint)
# --------------------------------------------------------------------------

class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent.setdefault(p, p)
        return x

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-label union keeps cluster ids = min member (url order)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


@dataclass
class OracleResult:
    assignments: pd.DataFrame      # url, cluster_id, canonical_url, cluster_size
    pair_status: dict = field(default_factory=dict)  # (url_a,url_b) -> status
    quarantine: list = field(default_factory=list)


def run_dedup_oracle(
    pages: pd.DataFrame, cfg: DedupConfig = DEFAULT_CONFIG
) -> OracleResult:
    # --- extract + normalize + quarantine ---
    text = pages.apply(
        lambda r: r["text"] if r["text"] is not None else extract_text_py(r["html"]),
        axis=1,
    )
    norm = text.map(normalize_text_py)
    ok = (
        text.notna()
        & (text.fillna("").str.strip().str.len() >= cfg.min_text_chars)
        # normalized-length quarantine (pipeline.prepare_stage parity)
        & (norm.fillna("").str.len() >= max(1, cfg.min_text_chars // 2))
    )
    docs = pd.DataFrame(
        {
            "url": pages["url"],
            "lang": pages["lang"],
            "text_norm": norm,
            "n_chars": text.fillna("").str.len(),
        }
    )[ok.values].reset_index(drop=True)
    quarantine = list(pages["url"][~ok.values])

    # --- exact dedup (Layer 1 phase 1): groups per (norm, lang) ---
    group_key = list(zip(docs["text_norm"], docs["lang"] if cfg.partition_by_lang else ""))
    groups: dict = defaultdict(list)
    for i, k in enumerate(group_key):
        groups[k].append(i)
    uf = _UnionFind()
    for url in docs["url"]:
        uf.find(url)
    reps_idx = []
    for members in groups.values():
        urls = sorted(docs["url"][i] for i in members)
        for u in urls[1:]:
            uf.union(u, urls[0])
        reps_idx.append(min(members, key=lambda i: docs["url"][i]))
    reps = docs.iloc[sorted(reps_idx)].reset_index(drop=True)

    # --- signatures over representatives (same batch function as Spark) ---
    feats = compute_features_pdf(reps["text_norm"], cfg)
    uids = np.array(
        [xxh64(u.encode("utf-8")) for u in reps["url"]], dtype=np.int64
    )

    # --- packed-key blocking + hot-bucket star (operators/lsh semantics) ---
    buckets: dict = defaultdict(list)
    for i in range(len(reps)):
        lang = reps["lang"][i] if cfg.partition_by_lang else ""
        for key in feats["keys"][i]:
            buckets[(lang, int(key))].append(i)
    pair_keys: dict = defaultdict(lambda: [0, 3])  # (ia,ib) -> [n_keys, best_tag]
    for (_lang, key), members in buckets.items():
        if len(members) < 2:
            continue
        tag = key & 3
        if len(members) <= cfg.hot_band_cap:
            pairs = [
                (a, b)
                for ai, a in enumerate(members)
                for b in members[ai + 1 :]
            ]
        else:
            rep = min(members, key=lambda i: uids[i])
            pairs = [(rep, m) for m in members if m != rep]
        for a, b in pairs:
            ia, ib = (a, b) if uids[a] < uids[b] else (b, a)
            ent = pair_keys[(ia, ib)]
            ent[0] += 1
            ent[1] = min(ent[1], tag)

    # --- verify (Layers 2-3) ---
    pair_status: dict = {}
    for (ia, ib), (n_keys, best_tag) in pair_keys.items():
        if best_tag == 2 and n_keys < 2:
            continue  # precision gate: anchor-only single co-fires dropped
            # (minhash bands and simchunk pair-keys stand alone —
            # operators/lsh.candidate_pairs parity)
        sa = feats["shingles"][ia]
        sb = feats["shingles"][ib]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 0.0
        ham = int(
            bin(
                int(np.uint64(np.int64(feats["simhash"][ia]))
                    ^ np.uint64(np.int64(feats["simhash"][ib])))
            ).count("1")
        )
        if j >= cfg.approve_jaccard:
            status = "confirmed"
        elif j < cfg.reject_jaccard:
            status = "rejected"
        elif ham <= cfg.simhash_confirm_hamming:
            status = "confirmed"
        else:
            span = longest_common_span(
                reps["text_norm"][ia], reps["text_norm"][ib], cfg.max_span_doc_bytes
            )
            status = "confirmed" if span >= cfg.min_span_bytes else "flagged"
        ua, ub = sorted((reps["url"][ia], reps["url"][ib]))
        pair_status[(ua, ub)] = status
        if status == "confirmed":
            uf.union(reps["url"][ia], reps["url"][ib])

    # --- assignments + A1 canonical rule ---
    cluster_of = {u: uf.find(u) for u in docs["url"]}
    members_of: dict = defaultdict(list)
    for i, u in enumerate(docs["url"]):
        members_of[cluster_of[u]].append(i)
    rows = []
    for cid, idxs in members_of.items():
        canonical = min(
            idxs, key=lambda i: (-docs["n_chars"][i], docs["url"][i])
        )
        for i in idxs:
            rows.append(
                {
                    "url": docs["url"][i],
                    "cluster_id": cid,
                    "canonical_url": docs["url"][canonical],
                    "cluster_size": len(idxs),
                }
            )
    return OracleResult(
        assignments=pd.DataFrame(rows),
        pair_status=pair_status,
        quarantine=quarantine,
    )
