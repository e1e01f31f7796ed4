"""Corpus-level span (line) dedup + per-document repetition stats.

Training-data pipeline operators beyond the reference's doc-level dedup
(the reference dedups whole entities/documents; web-scale corpora also
need SUB-document dedup — C4 removed any three-sentence span occurring
more than once in the corpus, CCNet hashes paragraphs, Gopher filters
docs by internal repetition). Web text here carries no reliable sentence
or line structure (the synthetic corpus is a single-space token stream),
so the unit is a fixed-size NON-OVERLAPPING token chunk — the same
shingle vocabulary as the MinHash path (functions/hashing) but disjoint,
so each token belongs to exactly one chunk and removing a chunk removes
its tokens exactly once.

All three operators are pure JVM dataflow (split / slice / transform /
posexplode / groupBy — no Python in the hot path) and SQL-expressible,
so the driver oracles them directly rather than via invariant
projections.

Scale shape (10^12 docs):

* ``chunk_segments`` — narrow map (one explode, ~n_tokens/K rows/doc).
* ``boilerplate_chunks`` — groupBy(chunk) with map-side partial
  aggregation: popular chunks (the ones that matter) collapse to one
  row per map partition before the shuffle, so shuffle volume is
  ~distinct-chunks-per-partition, not corpus tokens.
* ``line_dedup`` — the boilerplate set is tiny relative to the corpus
  (only chunks repeated across >= min_docs docs), so the anti/left join
  back is broadcastable; AQE converts it at runtime once the agg's size
  is known. Re-assembly is a per-doc groupBy whose fan-in is bounded by
  chunks-per-doc (document length / K), never corpus-sized.
* ``repetition_stats`` — per-doc only (groupBy doc_id, and a
  doc-local bigram mode); no corpus-wide state at all, embarrassingly
  parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 4,
    delim: str = " ",
) -> DataFrame:
    """(id, chunk_idx, chunk) — one row per non-overlapping token chunk
    (last chunk may be short), ``chunk_idx`` 0-based preserving document
    order for re-assembly. Null-text docs produce no rows.

    Shape note: tokenization is materialized as a column BEFORE the
    index explode and the chunk is sliced row-wise AFTER it — never
    ``transform(idx, i -> slice(split(text), ...))``: inside a
    higher-order-function lambda Spark re-evaluates the captured
    ``split`` for every chunk (O(tokens^2 / K) per doc; same finding as
    operators/winnow, PLANS.md §18). The token array is evaluated once
    per doc row and projected away before any exchange."""
    toks = F.split(F.col(text_col), delim)
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int").alias("_n"),
    ).filter(F.col("_n") > 0)
    return base.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("chunk_idx"),
    ).select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice("_toks", F.col("chunk_idx") * chunk_tokens + 1, chunk_tokens),
            delim,
        ).alias("chunk"),
    )


def boilerplate_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Chunks appearing in >= ``min_docs`` DISTINCT documents:
    (chunk, n_docs). The corpus-wide boilerplate vocabulary — small by
    construction (only repeated spans survive the HAVING)."""
    return (
        chunks.groupBy("chunk")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def clean_against(
    chunks: DataFrame,
    boilerplate: DataFrame,
    id_col: str = "doc_id",
    delim: str = " ",
) -> DataFrame:
    """Re-assemble each doc from its chunks minus a given boilerplate
    vocabulary: (id, n_chunks, n_boilerplate, clean_text).

    ``chunks`` is :func:`chunk_segments` output; ``boilerplate`` any
    frame with a ``chunk`` column (only that column is read). Split out
    of :func:`line_dedup` so the incremental engine can clean a batch
    against a MERGED vocabulary (base snapshot counts + batch counts)
    instead of recounting the corpus — the join/re-assembly plan is
    identical either way (broadcastable vocabulary, per-doc fan-in
    bounded by chunks-per-doc).
    """
    bp = boilerplate.select("chunk").distinct().withColumn(
        "_bp", F.lit(1)
    )
    marked = chunks.join(bp, "chunk", "left")
    kept_struct = F.when(
        F.col("_bp").isNull(), F.struct("chunk_idx", "chunk")
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.count("_bp").alias("n_boilerplate"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["chunk"],
            ),
            delim,
        ).alias("clean_text"),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 4,
    min_docs: int = 3,
    delim: str = " ",
) -> DataFrame:
    """C4-style span dedup: remove every chunk that occurs in >=
    ``min_docs`` distinct documents, re-assembling the survivors in
    document order. Returns one row per input doc (null-text docs
    excluded, as they have no chunks):

        (id, n_chunks, n_boilerplate, clean_text)

    ``clean_text`` is empty-string for a doc that was pure boilerplate —
    downstream quality filters (quarantine_near_empty) then drop it,
    mirroring C4's post-dedup length floor.
    """
    chunks = chunk_segments(docs, id_col, text_col, chunk_tokens, delim)
    bp = boilerplate_chunks(chunks, id_col, min_docs)
    return clean_against(chunks, bp, id_col, delim)


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 4,
    delim: str = " ",
) -> DataFrame:
    """Gopher-style per-document repetition quality signals:

        (id, n_chunks, dup_chunk_frac, top_bigram_frac)

    * ``dup_chunk_frac`` — fraction of the doc's chunks that are
      repeats of another chunk IN THE SAME DOC (Gopher's duplicate-line
      fraction analog): 1 - distinct/total.
    * ``top_bigram_frac`` — occurrences of the doc's most frequent
      overlapping token bigram / total bigrams (Gopher's top-2-gram
      character fraction, token-count flavored). 0.0 for docs with < 2
      tokens.

    Both are doc-local aggregates — no corpus-wide shuffle.
    """
    toks = F.split(F.col(text_col), delim)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(delim), b),
    )
    base = docs.select(F.col(id_col), bigrams.alias("_bigrams"))
    chunk_rows = chunk_segments(docs, id_col, text_col, chunk_tokens, delim)
    chunk_stats = chunk_rows.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        (
            F.lit(1.0)
            - F.countDistinct("chunk") / F.count("*").cast("double")
        ).alias("dup_chunk_frac"),
    )
    bigram_rows = base.select(id_col, F.explode("_bigrams").alias("bg"))
    bigram_stats = (
        bigram_rows.groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg((F.max("c") / F.sum("c").cast("double")).alias("top_bigram_frac"))
    )
    return chunk_stats.join(bigram_stats, id_col, "left").select(
        id_col,
        "n_chunks",
        "dup_chunk_frac",
        F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
    )
