"""Entity-name key derivation (X2 title strip / X3 singularize).

Mirrors the reference's pre-dedup normalization matrix
(/root/reference/tests/test_prededup.py:18-56): title variants fold,
plural variants fold, distinct names stay distinct — plus Spark/Python
parity on generated names (the Spark path is pure column expressions, the
Python path is the oracle used by the DuckDB driver check).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sift_kg_spark.functions.names import (
    entity_name_key,
    entity_name_key_py,
    singularize_words_py,
    strip_title_prefixes_py,
)

CASES = {
    # title stripping, incl. multi-title fixpoint and dotted/undotted
    "Dr. Sarah Chen": "sarah chen",
    "dr sarah chen": "sarah chen",
    "Detective Sgt. Miller": "miller",
    "Special Agent Dana Scully": "dana scully",
    "Vice President Harris": "harris",  # -is suffix is invariant
    "Mrs. Dr Smith": "smith",
    # titles NOT at the start survive
    "the doctor will see you": "the doctor will see you",
    # bare title with no following word survives
    "doctor": "doctor",
    # singularization
    "federal agencies": "federal agency",
    "the classes": "the class",
    "boxes churches wishes": "box church wish",
    "status analysis class": "status analysis class",
    "children and people": "child and person",
    "orders pages tables": "order page table",
}


def test_name_key_cases():
    for raw, want in CASES.items():
        assert entity_name_key_py(raw) == want, raw


def test_strip_is_fixpoint():
    # applying the strip twice never changes the result again
    for raw in CASES:
        once = strip_title_prefixes_py(raw.lower().strip())
        assert strip_title_prefixes_py(once) == once


def test_singularize_idempotent_on_outputs():
    # rule outputs that end in 's' only via invariant suffixes stay put
    for w in ("status", "analysis", "class", "bus"):
        assert singularize_words_py(singularize_words_py(w)) == singularize_words_py(w)


def test_spark_python_parity(spark):
    rows = [(i, raw) for i, raw in enumerate(CASES)] + [
        (100, "sgt. sgt. sgt. echo"),
        (101, ""),
        (102, "  spaced   words  "),
        (103, "Judge Miss Quizzes Studies"),
    ]
    df = spark.createDataFrame(rows, ["id", "raw"])
    got = {
        r["id"]: r["key"]
        for r in df.select(
            "id", entity_name_key(F.col("raw")).alias("key")
        ).collect()
    }
    for i, raw in rows:
        assert got[i] == entity_name_key_py(raw), (i, raw)
