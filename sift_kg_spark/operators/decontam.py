"""Benchmark decontamination: flag corpus documents that share any token
n-gram with an evaluation/benchmark set.

The standard training-data hygiene pass (GPT-3 appendix C / PaLM /
Llama use 8-13 token overlap): a training document is *contaminated*
when any of its n-grams also appears in a held-out benchmark document,
and contaminated docs are dropped or audited before training.

Reference parity note: the reference engine has no decontamination
stage — this operator is part of the training-data-pipeline tier the
task brief adds beyond the reference's own catalog (SURVEY.md §2.10).

Scale shape (100 TB corpus, MB-scale benchmark):
* benchmark grams are a DISTINCT set of 16-hex md5 prefixes, collected
  ONCE and broadcast — benchmark sets are eval-suite-sized (thousands
  of docs), orders of magnitude under the broadcast threshold;
* corpus grams are exploded map-side (the token array is materialized
  once per doc BEFORE the position explode — the O(tokens^2) HOF trap,
  PLANS.md §17) and inner-joined against the broadcast set map-side, so
  the only rows that ever reach a shuffle are the HITS, which are
  sparse by construction;
* the per-doc hit aggregation therefore shuffles only contaminated
  grams, and the final left join re-attaches hits to the corpus via a
  broadcast of the (small) hit table — the corpus itself never
  exchanges.
Set ``broadcast_benchmark=False`` for a benchmark too large to
broadcast (then the gram join becomes a shuffled hash join and AQE
sizes it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sift_kg_spark.operators.winnow import token_kgram_hashes


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, n_grams, n_hits, contaminated) — one row per corpus doc.

    ``n_grams`` counts the doc's overlapping n-token grams (0 for docs
    shorter than ``n`` tokens, which can never be contaminated at this
    gram length); ``n_hits`` counts its DISTINCT grams that appear
    anywhere in the benchmark; ``contaminated`` is
    ``n_hits >= min_hits``.  Gram identity is the 16-hex md5 prefix of
    the space-joined token window (same fingerprint family as
    operators/winnow; collisions are ~2^-64 per gram pair and
    deterministic for a fixed corpus).
    """
    bench_for_grams = benchmark.select(
        F.monotonically_increasing_id().alias("_bid"),
        F.col(bench_text_col).alias("_btext"),
    )
    bench_grams = (
        token_kgram_hashes(bench_for_grams, "_bid", "_btext", k=n)
        .select("gram_hash")
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)

    grams = token_kgram_hashes(corpus, id_col, text_col, k=n)
    # Map-side probe against the broadcast gram set: survivors (the
    # contaminated grams) are the only rows the groupBy shuffles.
    hits = (
        grams.join(bench_grams, "gram_hash")
        .groupBy(id_col)
        .agg(F.countDistinct("gram_hash").alias("n_hits"))
    )

    sizes = corpus.select(
        id_col,
        F.greatest(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")) - n + 1,
            F.lit(0),
        ).alias("n_grams"),
    )
    return (
        sizes.join(F.broadcast(hits), id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
