"""PII redaction: scrub emails, phone numbers, and IPv4 addresses from
text columns, and count what was scrubbed.

The standard pre-release hygiene pass on web corpora (CCNet/Dolma-style
rule redaction): each PII kind is a conservative regex rewritten to a
typed placeholder token, so downstream tokenization sees a stable
vocabulary item instead of the raw identifier.

Patterns are deliberately restricted to syntax with identical semantics
in Java regex (Spark), RE2 (DuckDB — the oracle re-derives the same
redaction in SQL), and Python ``re`` (the test oracle): character
classes, bounded repetition, alternation, non-capturing groups, and
ASCII word boundaries only — no lookaround, no backreferences.
Replacement tokens contain no digits or '@', so no pass can create a
match for a later pass: the chain is idempotent in any kind order.

Scale shape: pure JVM ``regexp_replace``/``regexp_count`` projections —
map-only, fused with the scan, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# kind -> (pattern, replacement). Order matters only for overlaps:
# emails are redacted first so an address's host part is never
# half-eaten by the IP pass.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    # international (+CC ...) or North-American (xxx) xxx-xxxx forms
    "phone": (
        r"\+\d[\d -]{7,14}\d|\(\d{3}\) ?\d{3}-\d{4}",
        "<PHONE>",
    ),
    "ip": (
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
}

DEFAULT_KINDS = ("email", "phone", "ip")


def redact_pii(col: Column, kinds: tuple = DEFAULT_KINDS) -> Column:
    """Text with every match of each kind replaced by its placeholder."""
    out = col
    for kind in kinds:
        pat, rep = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(col: Column, kinds: tuple = DEFAULT_KINDS) -> list:
    """One aliased count column per kind (``n_email``, ``n_phone``, ...).

    Counts run on the ORIGINAL text, all kinds independently — a
    phone-looking run inside an email address counts for both, which is
    the auditing-friendly convention (counts answer "how many of each
    pattern existed", not "how many tokens did redaction emit").
    """
    return [
        F.regexp_count(col, F.lit(PII_PATTERNS[k][0])).alias(f"n_{k}")
        for k in kinds
    ]
