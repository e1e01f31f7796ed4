"""Training-shard packing: assign documents to fixed-token-budget output
shards by global token offset.

The last step of a training-data pipeline: concatenate the corpus in a
deterministic document order and cut it into shards of ``shard_tokens``
tokens each. A document belongs to the shard containing its FIRST token
(offset-based contiguous packing — the linear, order-preserving
semantics sequence-packing writers use; documents are never reordered
to fill gaps, so the assignment is a pure function of the order column
and token counts).

The core is a GLOBAL prefix sum, which a naive implementation writes as
``sum().over(Window.orderBy(id))`` — an unpartitioned window that
funnels 100 TB through ONE task. This implementation uses the standard
two-level decomposition instead:

1. range-repartition by the order column (Spark's RangePartitioner
   keeps partition index order aligned with value order);
2. local cumulative sums inside each partition (window partitioned by
   partition id — bounded by partition size, never global);
3. per-partition totals — at most ``numPartitions`` rows — are
   collected, turned into running offsets on the driver, and broadcast
   back as a join.

Driver-side state is #partitions rows by construction (the same
bounded-collect posture as the IVF quantizer, operators/ann.py). The
result is independent of the partition count — pinned by test at
several partition counts and against a pure-Python cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = sum of ``val_col`` over all rows with
    ``order_col`` <= this row's (inclusive prefix sum in order-column
    order; ``order_col`` values must be distinct, ``val_col`` >= 0)."""
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    # Pin ONE physical execution of the range partitioning before anything
    # reads it twice: repartitionByRange derives its boundaries from a
    # reservoir sample whose seed varies per physical execution, so a
    # lazily recomputed `ranged` can assign rows to DIFFERENT _pid values
    # than the ones the offsets below were computed from — silently wrong
    # cumsums at scale (invisible in small tests, where the sample covers
    # the whole input and boundaries coincide). localCheckpoint
    # materializes the partitioning once; the totals collect and the
    # final join both read the same blocks (and a lost block fails loudly
    # instead of recomputing into a different partitioning).
    ranged = (
        df.repartitionByRange(nparts, F.col(order_col))
        .localCheckpoint(eager=True)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local", F.sum(val_col).over(w))
    # partition totals: cumsum of a non-negative column is monotone, so
    # the partition total is its max local cumsum
    totals = sorted(
        local.groupBy("_pid").agg(F.max("_local").alias("_tot")).collect(),
        key=lambda r: r._pid,
    )
    offsets, running = [], 0
    for r in totals:
        offsets.append((r._pid, running))
        running += r._tot
    off = spark.createDataFrame(offsets, schema="_pid int, _offset bigint")
    return (
        local.join(F.broadcast(off), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_offset"))
        .drop("_pid", "_local", "_offset")
    )


def assign_shards(
    docs: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Input columns + ``shard_id``: the fixed-budget shard containing
    the document's first token in ``id_col``-ordered concatenation."""
    cum = global_cumsum(docs, id_col, token_col, "_cum")
    return cum.withColumn(
        "shard_id",
        F.floor((F.col("_cum") - F.col(token_col)) / shard_tokens).cast(
            "long"
        ),
    ).drop("_cum")
