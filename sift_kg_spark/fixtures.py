"""Deterministic synthetic webtext corpus with planted duplicate classes.

Implements FIXTURES.md: a seeded generator for the canonical input table
``pages(url, warc_ts, html, text, lang)`` plus golden oracle tables
(``expected_pairs``, ``expected_clusters``, ``expected_flagged``,
``expected_text``). The planted classes mirror the reference's merge /
no-merge case matrix (/root/reference/tests/test_prededup.py:59-164):

  D0 unique singletons              -> never merged
  D1 exact duplicates               -> merge (Layer-1 exact stage)
  D2 case/accent variants           -> merge (normalization folds them)
  D3 near-duplicates (1-4% token edits, sentence insert/delete) -> merge
  D4 boilerplate-template group     -> must NOT merge (hot-band skew test)
  D5 containment (page B embeds page A's body among extra paragraphs,
     shared span >= 256 bytes)      -> merge via the suffix-array stage
  D6 cross-lang identical text      -> must NOT merge (per-lang grouping,
     the analog of the reference's per-entity-type grouping)
  D7 partial overlap (every 3rd sentence replaced) -> FLAGGED, not merged
  heavy-hitter family (~1% of rows identical)      -> skew + star test
  chain family A~B~C with A!~C directly            -> transitive closure

Every row's ``text`` is, by construction, exactly what
``extract_text_py`` produces from its ``html`` — the byte-identity
invariant is generated-in, then independently asserted by tests. ~40% of
rows ship html-only (text NULL) to exercise the extraction UDF; the rest
ship text-only.
"""

from __future__ import annotations

import itertools
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from sift_kg_spark.config import DEFAULT_CONFIG, DedupConfig
from sift_kg_spark.functions import hashing as H
from sift_kg_spark.functions.text import extract_text_py, normalize_text_py
from sift_kg_spark.operators.suffix import longest_common_span

_BASE_TS = np.datetime64("2024-01-01T00:00:00")

# ~220-word deterministic vocabulary (plain ASCII, no HTML metacharacters).
_CONS = "bcdfglmnprstvz"
_VOW = "aeiou"
VOCAB = [
    c1 + v1 + c2 + v2
    for (c1, v1), (c2, v2) in itertools.product(
        itertools.product(_CONS[:8], _VOW), itertools.product(_CONS[8:], _VOW)
    )
][:220]

_ACCENT_MAP = str.maketrans({"a": "á", "e": "é", "o": "ó", "u": "ü"})

_LANGS = np.array(["en", "es", "zh", "de"])
_LANG_P = np.array([0.7, 0.1, 0.1, 0.1])

_BOILER_TEMPLATES = 5


@dataclass
class _Corpus:
    rows: list = field(default_factory=list)
    pairs: list = field(default_factory=list)
    clusters: list = field(default_factory=list)  # (url, family_key, members)
    flagged: list = field(default_factory=list)


def _sentence(rng: np.random.Generator, n_words: int) -> list[str]:
    idx = rng.integers(0, len(VOCAB), size=n_words)
    return [VOCAB[i] for i in idx]


def _sentences(rng: np.random.Generator, n: int) -> list[str]:
    return [" ".join(_sentence(rng, int(rng.integers(6, 14)))) + "." for _ in range(n)]


def _boilerplate(template_id: int) -> tuple[str, str, str]:
    """(title, nav, footer) for one of the shared site templates."""
    rng = np.random.default_rng(9000 + template_id)
    title = " ".join(_sentence(rng, 4))
    nav = " ".join(_sentence(rng, 8))
    footer = " ".join(_sentence(rng, 8))
    return title, nav, footer


def _paragraphs(sents: list[str], rng: np.random.Generator) -> list[str]:
    paras: list[str] = []
    i = 0
    while i < len(sents):
        take = int(rng.integers(2, 5))
        paras.append(" ".join(sents[i : i + take]))
        i += take
    return paras


def build_html(title: str, nav: str, paras: list[str], footer: str) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<html><head><title>SKIPPED HEAD TITLE</title>"
        "<style>body{color:#222}</style>"
        "<script>var tracker=1;</script></head>"
        f"<body><h1>{title}</h1><nav>{nav}</nav>{body}"
        f"<footer>{footer}</footer></body></html>"
    )
    return html.encode("utf-8")


def page_text(title: str, nav: str, paras: list[str], footer: str) -> str:
    """Exactly what extract_text_py yields for build_html(...)."""
    return "\n".join([title, nav, *paras, footer])


def _pair_signals(
    text_a: str, text_b: str, cfg: DedupConfig
) -> tuple[float, int, int, int]:
    """(jaccard, hamming, span, anchor_overlap) for two page texts,
    computed with the SAME functions the engine uses — the generator
    plants classes that are consistent with the configured decision
    procedure, so the golden tables are ground truth *at this
    shingle/signature config* (the recall clause of BASELINE.json).

    ``anchor_overlap`` counts shared bottom-k anchors (the deterministic
    candidate channel): planted pairs require >= 3 so their DISCOVERY
    never depends on probabilistic LSH luck, only their judgment does.
    """
    from sift_kg_spark.operators.lsh import N_ANCHORS

    na, nb = normalize_text_py(text_a), normalize_text_py(text_b)
    th, off = H.tokenize_batch(pd.Series([na, nb]))
    sets = H.shingle_sets(th, off, cfg.shingle_k)
    a, b = sets[0], sets[1]
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    j = inter / union if union else 0.0
    sim = H.simhash64(th, off)
    ham = int(bin(int(sim[0] ^ sim[1])).count("1"))
    span = longest_common_span(na, nb)
    # engine convention: anchors = first N of the int64-sorted shingle view
    aa = np.sort(a.view(np.int64))[:N_ANCHORS]
    bb = np.sort(b.view(np.int64))[:N_ANCHORS]
    overlap = int(np.intersect1d(aa, bb, assume_unique=True).size)
    return j, ham, span, overlap


def _confirmable(j: float, ham: int, span: int, ov: int, cfg: DedupConfig) -> bool:
    """Would the engine discover AND confirm this pair — with safety
    margins, so engine-side estimation noise can never flip a planted
    expectation."""
    return ov >= 3 and (
        j >= cfg.approve_jaccard + 0.03
        or ham <= cfg.simhash_confirm_hamming - 1
        or (span >= cfg.min_span_bytes + 30 and j >= cfg.reject_jaccard + 0.05)
    )


def _strictly_flagged(j: float, ham: int, span: int, ov: int, cfg: DedupConfig) -> bool:
    return (
        ov >= 3
        and cfg.reject_jaccard + 0.05 <= j <= cfg.approve_jaccard - 0.05
        and ham >= cfg.simhash_confirm_hamming + 2
        and span <= cfg.min_span_bytes - 40
    )


class CorpusGenerator:
    def __init__(self, n_pages: int, seed: int = 42,
                 cfg: DedupConfig = DEFAULT_CONFIG) -> None:
        self.n = n_pages
        self.rng = np.random.default_rng(seed)
        self.cfg = cfg
        self.c = _Corpus()
        self._row_idx = 0
        self._family = 0

    # -- row emission -----------------------------------------------------
    def _url(self, cls: str, family: int, member: int) -> str:
        host = int(self.rng.integers(0, 20))
        return f"https://host{host:02d}.example/{cls}/{family:06d}/{member}"

    def _emit(
        self,
        cls: str,
        family: int,
        member: int,
        lang: str,
        sents: list[str],
        template: int,
        force_text: bool | None = None,
    ) -> dict:
        title, nav, footer = _boilerplate(template)
        paras = _paragraphs(sents, self.rng)
        text = page_text(title, nav, paras, footer)
        html = build_html(title, nav, paras, footer)
        url = self._url(cls, family, member)
        ts = _BASE_TS + np.timedelta64(int((self._row_idx * 37) % 10_000_000), "s")
        carry_html = (
            not force_text if force_text is not None else self.rng.random() < 0.4
        )
        row = {
            "url": url,
            "warc_ts": ts,
            "html": html if carry_html else None,
            "text": None if carry_html else text,
            "lang": lang,
            "_true_text": text,
            "_dup_class": cls,
            "_family": family,
        }
        self.c.rows.append(row)
        self._row_idx += 1
        return row

    def _lang(self) -> str:
        return str(self.rng.choice(_LANGS, p=_LANG_P))

    def _new_family(self) -> int:
        self._family += 1
        return self._family

    def _record_cluster(self, members: list[dict]) -> None:
        for a, b in itertools.combinations(members, 2):
            ua, ub = sorted((a["url"], b["url"]))
            self.c.pairs.append(
                {"url_a": ua, "url_b": ub, "dup_class": a["_dup_class"]}
            )
        # A1 canonical rule: longest text, then lexicographically-min url.
        canonical = min(members, key=lambda r: (-len(r["_true_text"]), r["url"]))
        for m in members:
            self.c.clusters.append(
                {
                    "url": m["url"],
                    "family_id": m["_family"],
                    "canonical_url": canonical["url"],
                }
            )

    # -- duplicate classes --------------------------------------------------
    def _mutate(self, sents: list[str], rate: float) -> list[str]:
        out = []
        for s in sents:
            words = s.rstrip(".").split()
            for i in range(len(words)):
                if self.rng.random() < rate:
                    words[i] = VOCAB[int(self.rng.integers(0, len(VOCAB)))]
            out.append(" ".join(words) + ".")
        return out

    def d0_unique(self) -> None:
        fam = self._new_family()
        n_sents = int(self.rng.integers(4, 40))
        self._emit("d0", fam, 0, self._lang(), _sentences(self.rng, n_sents),
                   int(self.rng.integers(0, _BOILER_TEMPLATES)))

    def d1_exact(self, size: int | None = None) -> None:
        fam = self._new_family()
        lang = self._lang()
        size = size or int(self.rng.integers(2, 4))
        sents = _sentences(self.rng, int(self.rng.integers(8, 40)))
        tpl = int(self.rng.integers(0, _BOILER_TEMPLATES))
        members = [self._emit("d1", fam, m, lang, sents, tpl) for m in range(size)]
        self._record_cluster(members)

    def d2_variant(self) -> None:
        fam = self._new_family()
        lang = self._lang()
        sents = _sentences(self.rng, int(self.rng.integers(8, 40)))
        tpl = int(self.rng.integers(0, _BOILER_TEMPLATES))
        a = self._emit("d2", fam, 0, lang, sents, tpl)
        variant = [
            "".join(
                ch.upper() if self.rng.random() < 0.1 else ch for ch in s
            ).translate(_ACCENT_MAP if self.rng.random() < 0.5 else {})
            for s in sents
        ]
        b = self._emit("d2", fam, 1, lang, variant, tpl)
        self._record_cluster([a, b])

    def _full_text(self, sents: list[str], tpl: int) -> str:
        """Signal-equivalent page text (normalization collapses the
        paragraph/line structure, so a flat join is exact for signals)."""
        title, nav, footer = _boilerplate(tpl)
        return " ".join([title, nav, *sents, footer])

    def d3_near(self) -> None:
        fam = self._new_family()
        lang = self._lang()
        size = int(self.rng.integers(2, 4))
        sents = _sentences(self.rng, int(self.rng.integers(12, 40)))
        tpl = int(self.rng.integers(0, _BOILER_TEMPLATES))
        base_text = self._full_text(sents, tpl)
        members = [self._emit("d3", fam, 0, lang, sents, tpl)]
        for m in range(1, size):
            rate = float(self.rng.uniform(0.01, 0.04))
            var = sents
            # resample until the planted pair is confirmable under the
            # configured thresholds (with margin) — see _pair_signals
            for attempt in range(8):
                var = self._mutate(sents, rate)
                op = self.rng.random()
                if attempt < 4:  # sentence-level ops only while roomy
                    if op < 0.3 and len(var) > 10:
                        var = var[: len(var) // 2] + var[len(var) // 2 + 1 :]
                    elif op < 0.6:
                        pos = int(self.rng.integers(0, len(var)))
                        var = var[:pos] + _sentences(self.rng, 1) + var[pos:]
                j, h, sp, ov = _pair_signals(base_text, self._full_text(var, tpl), self.cfg)
                if _confirmable(j, h, sp, ov, self.cfg):
                    break
                rate /= 2
            members.append(self._emit("d3", fam, m, lang, var, tpl))
        self._record_cluster(members)

    def d4_boilerplate_group(self) -> int:
        """Shared-template group with unique heavy bodies — no merges."""
        size = int(self.rng.integers(4, 9))
        tpl = int(self.rng.integers(0, _BOILER_TEMPLATES))
        for _ in range(size):
            fam = self._new_family()
            # extra shared disclaimer paragraph amplifies the hot-band skew
            rng_shared = np.random.default_rng(7777 + tpl)
            shared = _sentences(rng_shared, 4)
            body = _sentences(self.rng, int(self.rng.integers(18, 36)))
            self._emit("d4", fam, 0, self._lang(), shared + body, tpl)
        return size

    def d5_containment(self) -> None:
        fam = self._new_family()
        lang = self._lang()
        tpl = int(self.rng.integers(0, _BOILER_TEMPLATES))
        core = _sentences(self.rng, int(self.rng.integers(14, 30)))
        base_text = self._full_text(core, tpl)
        extra_frac = float(self.rng.uniform(0.6, 1.2))
        combined = core
        for _attempt in range(8):
            n_extra = max(2, int(len(core) * extra_frac))
            pre = _sentences(self.rng, n_extra // 2)
            post = _sentences(self.rng, n_extra - n_extra // 2)
            combined = pre + core + post
            j, h, sp, ov = _pair_signals(base_text, self._full_text(combined, tpl), self.cfg)
            # containment must be confirmable (usually via the suffix span)
            # AND similar enough for candidate generation to see the pair
            if _confirmable(j, h, sp, ov, self.cfg) and j >= 0.38:
                break
            extra_frac *= 0.7  # too much padding -> shrink and retry
        a = self._emit("d5", fam, 0, lang, core, tpl)
        b = self._emit("d5", fam, 1, lang, combined, tpl)
        self._record_cluster([a, b])

    def d6_cross_lang(self) -> None:
        fam = self._new_family()
        sents = _sentences(self.rng, int(self.rng.integers(8, 30)))
        tpl = int(self.rng.integers(0, _BOILER_TEMPLATES))
        langs = self.rng.choice(_LANGS, size=2, replace=False)
        for m, lang in enumerate(langs):
            self._emit("d6", fam, m, str(lang), sents, tpl)
        # no expected pairs / clusters: cross-lang must NOT merge

    def d7_flagged(self) -> None:
        fam = self._new_family()
        lang = self._lang()
        tpl = int(self.rng.integers(0, _BOILER_TEMPLATES))
        sents = _sentences(self.rng, int(self.rng.integers(15, 30)))
        base_text = self._full_text(sents, tpl)
        # replace every k-th sentence (phase-shifted per attempt) until the
        # pair sits strictly inside the DRAFT zone with margins on every
        # signal — a planted flagged pair must never be confirmable
        for attempt in range(8):
            mod = (3, 2, 3, 2, 4, 2, 3, 2)[attempt]
            phase = attempt % mod
            var = [
                _sentences(self.rng, 1)[0] if i % mod == phase else s
                for i, s in enumerate(sents)
            ]
            j, h, sp, ov = _pair_signals(base_text, self._full_text(var, tpl), self.cfg)
            if _strictly_flagged(j, h, sp, ov, self.cfg):
                a = self._emit("d7", fam, 0, lang, sents, tpl)
                b = self._emit("d7", fam, 1, lang, var, tpl)
                ua, ub = sorted((a["url"], b["url"]))
                self.c.flagged.append({"url_a": ua, "url_b": ub})
                return
        # could not plant a clean gray-zone pair from this draw: emit the
        # base alone as a unique doc (no flagged expectation recorded)
        self._emit("d0", fam, 0, lang, sents, tpl)

    def quarantine_row(self) -> None:
        fam = self._new_family()
        kind = self.rng.random()
        url = self._url("q", fam, 0)
        ts = _BASE_TS + np.timedelta64(int((self._row_idx * 37) % 10_000_000), "s")
        if kind < 0.5:  # near-empty text
            row = {"url": url, "warc_ts": ts, "html": None,
                   "text": "tiny.", "lang": self._lang(),
                   "_true_text": "tiny.", "_dup_class": "q", "_family": fam}
        else:  # nothing extractable
            row = {"url": url, "warc_ts": ts, "html": None, "text": None,
                   "lang": self._lang(), "_true_text": None,
                   "_dup_class": "q", "_family": fam}
        self.c.rows.append(row)
        self._row_idx += 1

    def chain_family(self) -> None:
        """A~B~C where A and C differ too much to pair directly."""
        fam = self._new_family()
        lang = "en"
        tpl = 0
        sents = _sentences(self.rng, 30)
        b_sents = sents
        for _ in range(8):
            b_sents = self._mutate(sents, 0.03)
            j, h, sp, ov = _pair_signals(
                self._full_text(sents, tpl), self._full_text(b_sents, tpl), self.cfg
            )
            if _confirmable(j, h, sp, ov, self.cfg):
                break
        c_sents = b_sents
        for _ in range(8):
            c_sents = self._mutate(b_sents, 0.03)
            j, h, sp, ov = _pair_signals(
                self._full_text(b_sents, tpl), self._full_text(c_sents, tpl), self.cfg
            )
            if _confirmable(j, h, sp, ov, self.cfg):
                break
        a = self._emit("chain", fam, 0, lang, sents, tpl)
        b = self._emit("chain", fam, 1, lang, b_sents, tpl)
        c = self._emit("chain", fam, 2, lang, c_sents, tpl)
        self._record_cluster([a, b, c])

    def heavy_family(self, size: int) -> None:
        fam = self._new_family()
        sents = _sentences(self.rng, 20)
        members = [
            self._emit("heavy", fam, m, "en", sents, 0) for m in range(size)
        ]
        self._record_cluster(members)

    # -- main loop ----------------------------------------------------------
    def generate(self) -> _Corpus:
        heavy_size = max(8, self.n // 100)
        self.heavy_family(heavy_size)
        self.chain_family()
        cum = np.cumsum([0.53, 0.10, 0.08, 0.12, 0.08, 0.05, 0.02, 0.01, 0.01])
        while self._row_idx < self.n:
            r = self.rng.random()
            if r < cum[0]:
                self.d0_unique()
            elif r < cum[1]:
                self.d1_exact()
            elif r < cum[2]:
                self.d2_variant()
            elif r < cum[3]:
                self.d3_near()
            elif r < cum[4]:
                self.d4_boilerplate_group()
            elif r < cum[5]:
                self.d5_containment()
            elif r < cum[6]:
                self.d6_cross_lang()
            elif r < cum[7]:
                self.d7_flagged()
            else:
                self.quarantine_row()
        return self.c


def generate_corpus(
    n_pages: int, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Returns (pages, expected_pairs, expected_clusters, expected_flagged)."""
    c = CorpusGenerator(n_pages, seed).generate()
    pages = pd.DataFrame(c.rows).drop(columns=["_dup_class", "_family"])
    pages = pages.rename(columns={"_true_text": "true_text"})
    pairs = pd.DataFrame(c.pairs, columns=["url_a", "url_b", "dup_class"])
    clusters = pd.DataFrame(
        c.clusters, columns=["url", "family_id", "canonical_url"]
    )
    flagged = pd.DataFrame(c.flagged, columns=["url_a", "url_b"])
    return pages, pairs, clusters, flagged


def write_corpus(outdir: str, n_pages: int, seed: int = 42) -> None:
    """Materialize pages + golden tables as parquet (single-process,
    deterministic; tests and bench read these)."""
    os.makedirs(outdir, exist_ok=True)
    pages, pairs, clusters, flagged = generate_corpus(n_pages, seed)
    # Spark's parquet reader rejects TIMESTAMP(NANOS); write microseconds.
    pages["warc_ts"] = pages["warc_ts"].astype("datetime64[us]")
    expected_text = pages[["url", "true_text"]].rename(
        columns={"true_text": "text"}
    )
    # Small row groups: Spark splits a parquet FILE only at row-group
    # boundaries — a single-row-group file makes the initial scan ONE task
    # regardless of cluster size (measured as a ~30% non-scaling component
    # of the pipeline at sf0.3 before this fix).
    pages.drop(columns=["true_text"]).to_parquet(
        os.path.join(outdir, "pages.parquet"), index=False, row_group_size=8192
    )
    expected_text.to_parquet(os.path.join(outdir, "expected_text.parquet"), index=False)
    pairs.to_parquet(os.path.join(outdir, "expected_pairs.parquet"), index=False)
    clusters.to_parquet(os.path.join(outdir, "expected_clusters.parquet"), index=False)
    flagged.to_parquet(os.path.join(outdir, "expected_flagged.parquet"), index=False)


def _self_check() -> None:
    pages, pairs, clusters, flagged = generate_corpus(200, 42)
    ok = 0
    for _, r in pages.iterrows():
        if r["html"] is not None and r["true_text"] is not None:
            assert extract_text_py(r["html"]) == r["true_text"], r["url"]
            ok += 1
    assert ok > 10
    print(f"self-check OK: {len(pages)} pages, {len(pairs)} expected pairs, "
          f"{len(clusters)} cluster rows, {len(flagged)} flagged, "
          f"{ok} html rows byte-verified")


if __name__ == "__main__":
    _self_check()
