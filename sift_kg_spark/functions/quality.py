"""Gopher-style document quality filtering (rule-based keep/reject).

Training-data pipelines gate web documents on cheap structural signals
before any model-based scoring; the canonical rule set is Gopher's
(Rae et al. 2021, "Scaling Language Models", appendix A1.1): word-count
bounds, mean-word-length bounds, symbol-to-word ratio, and a minimum
stop-word presence. The reference repo applies an analogous
quality gate before extraction (near-empty quarantine,
``sift-kg/src/ingest.py`` min-length checks); this module generalizes
that gate to the full published rule family.

Everything is a single narrow projection over JVM expressions — split /
aggregate / array_intersect inside whole-stage codegen, no shuffle, no
Python. At 10^12 docs this is a map-only stage that fuses with the
scan; the filter on ``keep`` pushes into downstream plans.

Thresholds are parameters (Gopher's published values are the
defaults) so corpora with different token statistics can re-gate
without code changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The published Gopher stop-word rule (Rae et al. 2021, A1.1): a document
# must contain at least two of these eight English function words. This is
# the DEFAULT — the rule as published, so a corpus gated here matches the
# paper's MassiveWeb filter.
STOPWORDS_GOPHER = ("the", "be", "to", "of", "and", "that", "have", "with")

# The frozen subset the lang-id voter (functions/text.py) anchors on —
# kept available so a pipeline that wants the quality gate and the lang-id
# heuristic to agree on what counts as an English function word can pass
# it explicitly (the pre-r5 default).
STOPWORDS_LANGID = ("the", "a", "an", "and", "of", "to", "in", "is", "that", "it")

# A fuller common-English function-word list for corpora where the 8-word
# rule under-rejects (e.g. keyword-stuffed spam that happens to contain
# "the" and "and"): the Gopher eight plus the highest-frequency English
# determiners/prepositions/pronouns. Opt-in via the ``stopwords=`` kwarg.
STOPWORDS_EN = STOPWORDS_GOPHER + (
    "a", "an", "in", "is", "it", "for", "on", "as", "was", "are",
    "at", "by", "this", "from", "or", "but", "not", "they", "his", "her",
)

STOPWORDS = STOPWORDS_GOPHER  # default alias (backwards-compatible name)

# Characters Gopher counts as "symbols" for the symbol-to-word ratio
# (hash and ellipsis in the paper; extended with the corpus punctuation
# class so the ratio is non-degenerate on punctuation-only junk rows).
_SYMBOL_RE = r"[#.,;:!?]"


def quality_signals(
    text: Column,
    *,
    stopwords: tuple = STOPWORDS,
) -> dict:
    """Raw quality signals for one text column, as named Columns.

    Returned dict keys: n_words, mean_word_len, symbol_ratio,
    n_stopwords. All are deterministic JVM expressions over a single
    tokenization (whitespace split of the trimmed text).
    """
    toks = F.split(F.trim(text), r"\s+")
    n_words = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_word_len = total_len / F.greatest(n_words, F.lit(1))
    n_symbols = F.length(text) - F.length(
        F.regexp_replace(text, _SYMBOL_RE, "")
    )
    symbol_ratio = n_symbols / F.greatest(n_words, F.lit(1))
    n_stopwords = F.size(
        F.array_intersect(
            toks, F.array(*[F.lit(s) for s in stopwords])
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "n_stopwords": n_stopwords,
    }


def gopher_keep(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopwords: int = 2,
    stopwords: tuple = STOPWORDS,
) -> Column:
    """Boolean conjunction of the Gopher rules over one text column —
    the predicate form of :func:`gopher_flags`, for use as a pipeline
    quarantine gate (config.quality_gate)."""
    s = quality_signals(text, stopwords=stopwords)
    return (
        (s["n_words"] >= min_words)
        & (s["n_words"] <= max_words)
        & (s["mean_word_len"] >= min_mean_word_len)
        & (s["mean_word_len"] <= max_mean_word_len)
        & (s["symbol_ratio"] <= max_symbol_ratio)
        & (s["n_stopwords"] >= min_stopwords)
    )


def gopher_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopwords: int = 2,
    stopwords: tuple = STOPWORDS,
) -> DataFrame:
    """Per-document Gopher rule flags plus the conjunctive ``keep`` bit.

    Output: id_col, n_words, mean_word_len (double), symbol_ratio
    (double), n_stopwords, words_ok/word_len_ok/symbol_ok/stopword_ok
    (int 0/1 for stable cross-engine hashing), keep (int 0/1).
    """
    s = quality_signals(F.col(text_col), stopwords=stopwords)
    words_ok = (s["n_words"] >= min_words) & (s["n_words"] <= max_words)
    word_len_ok = (s["mean_word_len"] >= min_mean_word_len) & (
        s["mean_word_len"] <= max_mean_word_len
    )
    symbol_ok = s["symbol_ratio"] <= max_symbol_ratio
    stopword_ok = s["n_stopwords"] >= min_stopwords
    keep = words_ok & word_len_ok & symbol_ok & stopword_ok
    return docs.select(
        id_col,
        s["n_words"].alias("n_words"),
        s["mean_word_len"].cast("double").alias("mean_word_len"),
        s["symbol_ratio"].cast("double").alias("symbol_ratio"),
        s["n_stopwords"].alias("n_stopwords"),
        words_ok.cast("int").alias("words_ok"),
        word_len_ok.cast("int").alias("word_len_ok"),
        symbol_ok.cast("int").alias("symbol_ok"),
        stopword_ok.cast("int").alias("stopword_ok"),
        keep.cast("int").alias("keep"),
    )
