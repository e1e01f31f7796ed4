"""Corpus n-gram frequency statistics: the top-k most frequent token
n-grams with occurrence and document counts.

The standard corpus-analysis pass (boilerplate discovery, stopword
candidate mining, contamination triage): count every overlapping
n-token gram across the corpus and keep the k heaviest.

Scale shape (100 TB corpus):
* the token array is materialized ONCE per doc before the position
  explode and the gram is sliced row-wise after it (the O(tokens^2)
  higher-order-function trap, PLANS.md §17);
* the gram count is a map-side-combining groupBy — partial counts
  collapse within each scan task before the single gram exchange;
* top-k is ``orderBy(...).limit(k)``, which Spark plans as
  TakeOrderedAndProject: per-partition heaps of size k merged on the
  driver — k rows cross the wire per partition, never a global sort of
  the gram table.
Ties are broken by gram string ascending, so the cutoff row is
deterministic across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sift_kg_spark.operators.winnow import TOKEN_DELIM


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram, n_occurrences, n_docs) — the k most frequent n-grams.

    ``n_occurrences`` counts every overlapping position;``n_docs``
    counts distinct carrying documents. Ordered by count descending,
    gram ascending (total order — the limit boundary is deterministic).
    """
    toks = F.split(F.trim(F.col(text_col)), TOKEN_DELIM)
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        (F.size(toks) - n + 1).alias("_n_grams"),
    ).filter(F.col("_n_grams") >= 1)
    grams = base.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.col("_n_grams"))).alias("_pos"),
        "_toks",
    ).select(
        id_col,
        F.array_join(F.slice("_toks", F.col("_pos"), n), " ").alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(k)
    )
