"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03).

The third fingerprint family next to MinHash (probabilistic set overlap,
``operators/lsh``) and the suffix-array screen (pairwise exact spans,
``operators/suffix``): winnowing selects, from every window of ``w``
consecutive k-gram hashes, the minimal hash — giving a per-document
fingerprint SET with the classic guarantee that any shared token run of
at least ``w + k - 1`` tokens between two documents produces at least
one shared fingerprint VALUE. Unlike MinHash the selection is
position-local (robust to document length skew), and unlike the suffix
screen it is corpus-level: fingerprints are joinable keys, so "which
documents share a long span with whom" is one exchange, not a pairwise
confirm. This is the reference's exact-substring intent
(``sift-kg/src/resolve.py`` long-shared-span confirmation) re-expressed
as a corpus-wide index instead of a per-pair check.

Semantics pinned for the DuckDB oracle (and the pure-Python reference in
``tests/test_winnow.py``):

* tokens: ``\\s+`` split of the trimmed text (the corpus tokenizer used
  by the MinHash path);
* gram hash: first 16 hex chars of md5 of the space-joined k-gram —
  identical bytes in Spark, DuckDB and Python, and lexicographic ``min``
  over hex strings is engine-independent;
* full windows only (window start ``pos <= n_grams - w + 1``), so a
  document needs ``>= k + w - 1`` tokens to fingerprint at all;
* the output is the DISTINCT (doc, fingerprint-value) set — tie-breaking
  inside a window is irrelevant because every selection is the window's
  min VALUE.

Scale shape (10^12 docs):

* ``token_kgram_hashes`` — narrow map + one generator (posexplode),
  O(tokens) rows per doc, fuses with the scan.
* ``winnow_fingerprints`` — the window runs PARTITIONED BY doc ordered
  by position: doc-local state bounded by document length, never a
  corpus-wide sort (contrast the global-window anti-pattern). The
  distinct collapses w-fold duplication map-side before its exchange.
* ``fingerprint_pairs`` — same one-exchange shape as the LSH candidate
  exchange (``operators/lsh.candidate_pairs``): bucket size/rep come
  from a window over the single fingerprint shuffle, hot buckets (a
  fingerprint shared by > ``hot_cap`` docs, i.e. boilerplate) degrade to
  O(n) star pairing against the bucket's min-doc representative instead
  of O(n^2) self-join rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_DELIM = r"\s+"


def token_kgram_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, pos, gram_hash, n_grams) — one row per overlapping k-token
    gram, ``pos`` 1-based in document order, ``gram_hash`` the 16-hex-char
    md5 prefix of the space-joined gram. Docs with fewer than ``k``
    tokens produce no rows.

    Shape note: the tokenization is materialized as a column BEFORE the
    position explode, and the gram is sliced row-wise AFTER it — never
    ``transform(sequence, i -> slice(split(text), i, k))``. Inside a
    higher-order-function lambda Spark re-evaluates the captured
    ``split`` for EVERY gram (subexpression elimination does not hoist
    through lambda boundaries), turning tokenization O(tokens^2) per
    document — measured 7x slower end-to-end at sf0.1 (PLANS.md §17).
    The Generate boundary keeps the token array evaluated once per doc
    row, and the array is projected away before any exchange."""
    toks = F.split(F.trim(F.col(text_col)), TOKEN_DELIM)
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        (F.size(toks) - k + 1).alias("n_grams"),
    ).filter(F.col("n_grams") >= 1)
    return base.select(
        id_col,
        "_toks",
        "n_grams",
        F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("pos"),
    ).select(
        id_col,
        "pos",
        F.substring(
            F.md5(F.array_join(F.slice("_toks", F.col("pos"), k), " ")), 1, 16
        ).alias("gram_hash"),
        "n_grams",
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Distinct (id, fp) winnowing fingerprint set per document.

    Guarantee: two documents sharing a token run of >= ``w + k - 1``
    tokens share at least one ``fp`` value (property-tested against a
    brute-force Python oracle in tests/test_winnow.py).
    """
    g = token_kgram_hashes(docs, id_col, text_col, k)
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        g.withColumn("fp", F.min("gram_hash").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - w + 1)
        .select(id_col, "fp")
        .distinct()
    )


def fingerprint_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    hot_cap: int = 64,
    salted_sizing: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, n_shared) — document pairs sharing >= ``min_shared``
    fingerprint values, ``doc_a < doc_b``.

    One exchange, ONE join, no union: bucket size and representative
    come from a window over the fingerprint shuffle, and because the
    representative is the bucket's MIN id, the hot-bucket star pairs
    (rep, member) always satisfy rep < member — so "all a<b pairs inside
    normal buckets, plus star pairs inside hot buckets" is a single
    equi-join of [all members] against [normal members + hot reps] under
    the one condition doc_a < doc_b. Compared to the union-of-branches
    shape this removes the third consumer of the fingerprint exchange,
    which AQE's runtime stage-reuse cannot deduplicate once sibling
    stages materialize in the same round (measured: the union form
    re-ran the winnow window + a second fp shuffle for the hot branch;
    this form computes the fingerprint pipeline once — receipt in
    PLANS.md). A boilerplate fingerprint shared by millions of docs
    costs O(n) rows, not O(n^2); ``n_shared`` for star pairs counts only
    rep-adjacent co-occurrences — the deliberate degradation documented
    for the LSH hot branch.

    ``salted_sizing=True`` swaps the sizing window for the two-level
    pre-salted count (operators/lsh.sized_buckets — map-side-combined
    partials, no single-task mega-bucket scan, one extra exchange);
    output is bit-identical either way.
    """
    from pyspark import StorageLevel

    from sift_kg_spark.operators.lsh import sized_buckets

    # Pin the input fingerprint set: the pairing self-join's two sides
    # each re-execute their subtree (AQE same-round stage
    # materialization does not deduplicate identical sibling exchanges),
    # and for a raw caller that subtree is the whole winnowing pipeline
    # (gram md5 + per-doc window + distinct) — compute it once.
    fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    sized = sized_buckets(
        fps, ["fp"], id_col, salted=salted_sizing
    ).withColumnRenamed("bucket_size", "n_docs").withColumnRenamed(
        "bucket_rep", "rep"
    )
    # doc_a side: every member of a normal bucket, only the min-id rep of
    # a hot bucket. doc_b side: every member. doc_a < doc_b yields each
    # normal pair once and each hot star pair once (rep is the minimum).
    a_side = sized.filter(
        (F.col("n_docs") <= hot_cap) | (F.col(id_col) == F.col("rep"))
    ).select("fp", F.col(id_col).alias("doc_a"))
    b_side = sized.select("fp", F.col(id_col).alias("doc_b"))
    # merge hint: same rationale as lsh.candidate_pairs — tiny size
    # estimates otherwise broadcast-build one side, re-running the whole
    # fingerprint chain instead of reusing the fp exchange.
    return (
        a_side.join(b_side.hint("merge"), "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
