"""Substring search over document/entity text columns (F4/F5).

Reference parity: the CLI's interactive search scans every entity's name
and aliases for a case-insensitive substring and prints the hits
(/root/reference/src/sift_kg/cli.py:603-622). The Spark-scale analog is a
predicate over any set of string columns, expressed with built-in
``contains`` so it stays inside WholeStageCodegen and pushes through
column pruning (only the searched + projected columns are read).

At 100 TB, substring search over raw text is a full scan by nature; the
operator keeps the scan narrow (searched columns only) and composable
with partition-pruning filters (e.g. ``lang``) that DO reach the parquet
reader. An inverted-index/token-bucket side table is the seam for
sub-scan latency — out of scope for the engine core.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def search_predicate(
    needle: str,
    cols: Sequence[str] = ("text",),
    case_insensitive: bool = True,
) -> Column:
    """OR-of-contains predicate across ``cols`` (ref: name OR aliases)."""
    if not cols:
        raise ValueError("cols must name at least one string column")
    if case_insensitive:
        needle = needle.lower()
    pred: Column | None = None
    for c in cols:
        col = F.lower(F.col(c)) if case_insensitive else F.col(c)
        hit = col.contains(needle)
        pred = hit if pred is None else (pred | hit)
    return pred


def search_substring(
    df: DataFrame,
    needle: str,
    cols: Sequence[str] = ("text",),
    case_insensitive: bool = True,
) -> DataFrame:
    """Rows where any of ``cols`` contains ``needle`` (F5 substring
    search; case-insensitive by default, matching the reference CLI)."""
    return df.filter(search_predicate(needle, cols, case_insensitive))
