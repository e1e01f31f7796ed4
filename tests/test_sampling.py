"""Hash-deterministic sampling vs a hashlib Python oracle.

Membership is a pure function of (salt, key, rate) — the Spark output
must equal the Python md5 computation row for row, twice in a row.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sift_kg_spark.operators.sampling import (
    stratified_sample,
    token_budget_sample,
)


def py_keep(salt: str, key, rate: float) -> bool:
    if rate >= 1.0:
        return True
    th = format(math.floor(rate * 4294967296.0), "08x")
    return hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8] < th


class TestStratifiedSample:
    RATES = [("a", 0.3), ("b", 1.0), ("c", 0.0)]

    def _corpus(self, spark, n=600):
        rows = [(i, "abc"[i % 3]) for i in range(n)]
        return spark.createDataFrame(rows, ["doc_id", "lang"]), rows

    def test_membership_matches_python_oracle_and_is_deterministic(
        self, spark
    ):
        df, rows = self._corpus(spark)
        rates = spark.createDataFrame(self.RATES, ["lang", "rate"])
        got1 = {
            r.doc_id
            for r in stratified_sample(df, rates, salt="s1").collect()
        }
        got2 = {
            r.doc_id
            for r in stratified_sample(df, rates, salt="s1").collect()
        }
        assert got1 == got2
        rate_of = dict(self.RATES)
        expect = {
            i for i, lang in rows if py_keep("s1", i, rate_of[lang])
        }
        assert got1 == expect
        # rate 1.0 keeps every 'b' row; rate 0.0 keeps no 'c' row
        assert {i for i, lg in rows if lg == "b"} <= got1
        assert not any(lg == "c" for i, lg in rows if i in got1)

    def test_unweighted_stratum_dropped(self, spark):
        df, _ = self._corpus(spark)
        rates = spark.createDataFrame([("a", 1.0)], ["lang", "rate"])
        langs = {
            r.lang for r in stratified_sample(df, rates).collect()
        }
        assert langs == {"a"}

    def test_disjoint_salts_differ(self, spark):
        df, _ = self._corpus(spark)
        rates = spark.createDataFrame([("a", 0.3), ("b", 0.3), ("c", 0.3)],
                                      ["lang", "rate"])
        s1 = {r.doc_id for r in stratified_sample(df, rates, salt="x").collect()}
        s2 = {r.doc_id for r in stratified_sample(df, rates, salt="y").collect()}
        assert s1 != s2


class TestTokenBudgetSample:
    def test_rates_derived_from_totals(self, spark):
        # stratum 'small': 5 docs x 10 tokens = 50 <= budget -> all kept;
        # stratum 'big': 200 docs x 10 tokens = 2000 -> rate 100/2000
        rows = [(i, "small", 10) for i in range(5)] + [
            (100 + i, "big", 10) for i in range(200)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tokens"])
        out = token_budget_sample(df, 100.0, salt="b1").collect()
        kept = {r.doc_id for r in out}
        assert {i for i in range(5)} <= kept
        rate = 100.0 / 2000.0
        expect_big = {
            100 + i for i in range(200) if py_keep("b1", 100 + i, rate)
        }
        assert {d for d in kept if d >= 100} == expect_big
        # output schema is the input schema
        assert sorted(out[0].asDict()) == ["doc_id", "lang", "n_tokens"]
