"""Shard packing / global cumsum vs a pure-Python prefix sum.

The assignment must be a pure function of (order column, token counts)
— identical at every partition count, never dependent on physical
layout.
"""

from __future__ import annotations

import random

from sift_kg_spark.operators.packing import assign_shards, global_cumsum


def py_shards(rows, shard_tokens):
    out, cum = {}, 0
    for did, toks in sorted(rows):
        out[did] = cum // shard_tokens
        cum += toks
    return out


class TestGlobalCumsum:
    def test_matches_python_at_any_partition_count(self, spark):
        rng = random.Random(5)
        rows = [(i * 7 % 1009, rng.randint(0, 50)) for i in range(400)]
        # distinct, unordered, gappy ids
        assert len({r[0] for r in rows}) == len(rows)
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        want = {}
        cum = 0
        for did, toks in sorted(rows):
            cum += toks
            want[did] = cum
        for nparts in (1, 4, 13):
            got = {
                r.doc_id: r.cumsum
                for r in global_cumsum(
                    df, "doc_id", "n_tokens", num_partitions=nparts
                ).collect()
            }
            assert got == want, nparts


class TestGlobalCumsumPinning:
    def test_range_partitioning_is_materialized_once(self, spark):
        # The offsets collect and the final join MUST read the same
        # physical partitioning: repartitionByRange samples its
        # boundaries per physical execution, so a lazily recomputed
        # input can land rows in different _pid partitions than the
        # ones the offsets were computed from (ADVICE r5, high). The
        # fix pins the partitioning with an eager localCheckpoint; this
        # test asserts the pin exists by checking the plan reads a
        # checkpointed scan, and that a NON-DETERMINISTIC input (which
        # would differ per recompute) still cumsums correctly.
        from pyspark.sql import functions as F

        base = spark.range(0, 500).select(
            F.col("id").alias("doc_id"),
            # rand() re-draws on every recompute: without the single
            # materialization the totals and the joined locals would be
            # computed from two different samples of this column.
            (F.rand(seed=7) * 100).cast("long").alias("n_tokens"),
        )
        out = global_cumsum(base, "doc_id", "n_tokens", num_partitions=5)
        rows = sorted(out.collect(), key=lambda r: r.doc_id)
        # self-consistency: the cumsum deltas equal the row's own tokens
        prev = 0
        for r in rows:
            assert r.cumsum - prev == r.n_tokens, r
            prev = r.cumsum
        # the pin is structural: an ExistingRDD/checkpoint scan feeds the
        # window, not a re-executed range exchange
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan or "LogicalRDD" in plan or "Scan" in plan

    def test_empty_input_returns_empty(self, spark):
        df = spark.createDataFrame([], "doc_id long, n_tokens long")
        out = global_cumsum(df, "doc_id", "n_tokens")
        assert out.count() == 0
        assert "cumsum" in out.columns


class TestAssignShards:
    def test_matches_python_and_boundary_semantics(self, spark):
        rng = random.Random(9)
        rows = [(i, rng.randint(1, 300)) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        got = {
            r.doc_id: r.shard_id
            for r in assign_shards(df, shard_tokens=1000).collect()
        }
        assert got == py_shards(rows, 1000)
        # shard ids are a contiguous 0..max range in doc order
        order = [got[d] for d, _ in sorted(rows)]
        assert order[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(order, order[1:]))

    def test_straddling_doc_assigned_to_start_shard(self, spark):
        # doc 1 starts at offset 900 (< 1000) and ends past the boundary
        rows = [(0, 900), (1, 500), (2, 100)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        got = {
            r.doc_id: r.shard_id
            for r in assign_shards(df, shard_tokens=1000).collect()
        }
        assert got == {0: 0, 1: 0, 2: 1}
