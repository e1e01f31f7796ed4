"""URL canonicalization + capture dedup for Common-Crawl-style corpora.

A crawl snapshot carries the same logical page under many URL spellings
(scheme/host case, default ports, fragments, tracking parameters,
query-parameter order, trailing slash) and under many capture
timestamps. Canonicalizing the URL and keeping one capture per
canonical URL is the standard first dedup tier — it removes exact
re-crawls *before* any content hashing, so the expensive MinHash tiers
never see them. The reference dedups only on extracted content
(``sift-kg/src/ingest.py`` discovers by path; no URL normalization);
this module adds the crawl-native tier the reference never needed.

Canonicalization is a fixed sequence of string rewrites, all JVM
``regexp_replace`` / higher-order array expressions (no UDF, no
shuffle — a narrow map that fuses with the scan):

1. strip the fragment (``#...``),
2. lowercase the scheme and authority (host[:port]) — path and query
   stay case-sensitive,
3. drop default ports (``:80`` for http, ``:443`` for https),
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``), sort the surviving query parameters
   byte-wise, and re-join (``?`` dropped when nothing survives),
5. strip one trailing slash from a non-root path.

``dedup_captures`` then keeps the latest capture per canonical URL —
a single ``max_by`` groupBy with map-side partial aggregation; at
10^12 rows this shuffles one row per (canonical URL x map partition),
never the raw captures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that never identify content. Kept as one alternation
# so the Spark filter() lambda and the DuckDB oracle share the regex.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z]+|fbclid|gclid|msclkid|ref)="


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules; null-safe."""
    # 1. fragment off
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase scheme://authority (everything before the first '/'
    #    after the scheme, or before '?' when there is no path)
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    tail = F.substring(u, F.length(head) + F.lit(1), F.length(u))
    u = F.concat(F.lower(head), tail)
    # 3. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?]+):80(?=[/?]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?]+):443(?=[/?]|$)", r"$1")
    # 4. query rewrite: split off the query string, filter + sort params
    base = F.regexp_replace(u, r"\?.*$", "")
    qs = F.when(
        u.contains("?"), F.regexp_replace(u, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    u = F.when(
        F.size(params) > 0,
        F.concat(base, F.lit("?"), F.array_join(params, "&")),
    ).otherwise(base)
    # 5. trailing slash on a non-root path (authority intact)
    return F.regexp_replace(u, r"(://[^/?]+/[^?]*[^/?])/(?=\?|$)", r"$1")


def canonicalize(
    pages: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Append ``out_col`` holding the canonical form of ``url_col``."""
    return pages.withColumn(out_col, canonical_url(F.col(url_col)))


def dedup_captures(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """One row per canonical URL: the latest capture (``max_by`` on
    ``ts_col``, ties broken by the raw URL string for determinism).

    Output: canonical_url, url (winning capture's raw URL), ts_col
    (winning capture time), n_captures.
    """
    c = canonicalize(pages, url_col)
    # total order for the pick: (ts, raw url) — deterministic under
    # identical timestamps, which re-crawl batches do produce
    pick = F.struct(F.col(ts_col), F.col(url_col))
    return c.groupBy("canonical_url").agg(
        F.max_by(F.col(url_col), pick).alias(url_col),
        F.max(ts_col).alias(ts_col),
        F.count(F.lit(1)).alias("n_captures"),
    )


def latest_captures(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Full-row capture dedup: the latest capture's entire row survives
    per canonical URL (same total order as :func:`dedup_captures`).

    Schema-preserving (same columns as the input), so it drops into a
    pipeline ahead of extraction — the expensive pandas-UDF walk then
    never sees superseded re-crawls. One groupBy on the canonical URL
    with a single ``max_by`` over the packed row struct: map-side
    partial aggregation keeps the shuffle at one row per (canonical URL
    x map partition)."""
    cols = list(pages.columns)
    c = canonicalize(pages, url_col)
    pick = F.struct(F.col(ts_col), F.col(url_col))
    return (
        c.groupBy("canonical_url")
        .agg(F.max_by(F.struct(*cols), pick).alias("_r"))
        .select("_r.*")
    )
