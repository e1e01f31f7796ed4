"""Hash-deterministic sampling: reproducible per-stratum subsampling and
token-budget corpus mixing.

Training-data pipelines re-weight sources ("mix 30% web, 50% code, ...")
and downsample over-represented strata. Random sampling is not
reproducible across engines or re-runs; the standard fix is HASH
sampling: keep a row iff the first 8 hex chars of md5(salt:key) fall
below the rate threshold. Membership is then a pure function of
(salt, key, rate) — identical in Spark, DuckDB, Python, any engine with
md5 — so samples are stable under retries, resumable pipelines, and
cross-engine audits, and disjoint salts give independent samples.

Reference parity note: the reference engine has no sampling stage —
this operator belongs to the training-data-pipeline tier added beyond
the reference catalog (COVERAGE.md "Beyond the reference").

Scale shape (100 TB corpus):
* fixed-rate path: ONE broadcast join against the strata->rate table
  (strata count in the hundreds at most) followed by a map-only filter
  on md5 of columns already in the row — the corpus never exchanges and
  the filter fuses with the scan;
* budget path adds one map-side-combined groupBy over the stratum
  column (output = #strata rows) whose result is broadcast back — still
  no corpus-scale shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 16^8: thresholds compare the first 8 hex chars of md5 as a fraction
# of the full 32-bit space.
_HEX8_SPACE = 4294967296.0


def hash_keep(key: Column, rate: Column, salt: str = "") -> Column:
    """Boolean keep-decision: md5('salt:key') first-8-hex < rate.

    ``rate >= 1.0`` short-circuits to keep-all (the 8-hex threshold
    cannot express 1.0 exactly); rate <= 0 keeps nothing. The hex
    comparison is lexicographic on lowercase hex, which equals numeric
    order at fixed width — the same expression any other md5-capable
    engine evaluates identically.
    """
    digest = F.md5(F.concat_ws(":", F.lit(salt), key.cast("string")))
    thresh = F.format_string(
        "%08x", F.floor(rate * F.lit(_HEX8_SPACE)).cast("long")
    )
    return (rate >= 1.0) | (F.substring(digest, 1, 8) < thresh)


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    rate_col: str = "rate",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum subsample.

    ``rates`` maps stratum -> keep rate in [0, 1]; strata absent from
    ``rates`` are DROPPED (explicit-allowlist semantics — a source you
    did not weight does not silently ride along at rate 1). Output
    schema = input schema (the rate column is projected away).
    """
    joined = df.join(F.broadcast(rates), stratum_col, "inner")
    return joined.filter(
        hash_keep(F.col(key_col), F.col(rate_col), salt)
    ).drop(rate_col)


def token_budget_sample(
    df: DataFrame,
    budget_tokens: float,
    stratum_col: str = "lang",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Corpus mixing to a per-stratum token budget.

    Derives each stratum's keep rate as
    ``min(1, budget_tokens / sum(token_col))`` — over-budget strata are
    downsampled proportionally, under-budget strata are kept whole —
    then hash-samples at that rate. The expected kept token mass per
    over-budget stratum is ``budget_tokens``.
    """
    totals = df.groupBy(stratum_col).agg(
        F.sum(token_col).alias("_total_tokens")
    )
    rates = totals.select(
        stratum_col,
        F.least(
            F.lit(1.0), F.lit(float(budget_tokens)) / F.col("_total_tokens")
        ).alias("rate"),
    )
    return stratified_sample(df, rates, stratum_col, key_col, "rate", salt)
