"""Continuous ingest: Structured Streaming -> incremental dedup.

The reference is a one-shot batch CLI (SURVEY §2.10); a production crawl
is a continuously landing directory of page files. This module wires
Spark Structured Streaming over that landing zone to the incremental
engine (incremental.py): each micro-batch is deduplicated against
everything ingested so far — signatures only for unseen texts, candidate
buckets only where a new key lands, supernode-contracted clustering — so
steady-state cost per micro-batch is O(batch), not O(corpus).

Design notes for cluster scale:

* ``foreachBatch`` (not a streaming agg): the dedup decision procedure is
  a multi-stage batch dataflow with its own exactly-once story (StageStore
  snapshots + manifests), so the stream is used purely for incremental
  file discovery + scheduling. This is the documented Spark pattern for
  stateful jobs whose state lives in external tables.
* State between micro-batches IS the snapshot directory: batch N's
  combined `prepared`/`features`/`assignments` become batch N+1's base.
  A crashed micro-batch replays idempotently — re-delivered urls are
  dropped by the increment's anti-join, and the streaming checkpoint
  prevents double-processing of input files.
* Watermarks/event-time operators are deliberately absent: dedup keys on
  content, not arrival time; late data is just another append batch.

The first micro-batch bootstraps a base run; subsequent ones run
incrementally. Each micro-batch's combined assignments/clusters land in
``workdir/gen=<n>`` so downstream readers always see a complete,
immutable generation (the `latest` pointer file flips atomically).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from sift_kg_spark.config import DEFAULT_CONFIG, DedupConfig
from sift_kg_spark.incremental import run_dedup_incremental
from sift_kg_spark.pipeline import run_dedup

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _gen_dir(workdir: str, gen: int) -> str:
    return os.path.join(workdir, f"gen={gen}")


def latest_generation(workdir: str) -> int | None:
    """Highest complete generation, or None before the first batch."""
    ptr = os.path.join(workdir, "_latest.json")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return json.load(fh)["gen"]


def _commit_latest(workdir: str, gen: int, batch_id: int, n_rows: int) -> None:
    ptr = os.path.join(workdir, "_latest.json")
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"gen": gen, "batch_id": batch_id, "rows": n_rows}, fh)
    os.replace(tmp, ptr)  # atomic generation flip


def process_batch(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    batch_id: int = 0,
) -> None:
    """Dedup one micro-batch against the accumulated corpus state.

    Exposed separately from the stream wiring so tests (and backfills)
    can drive it with plain DataFrames.
    """
    prev = latest_generation(workdir)
    gen = 0 if prev is None else prev + 1
    gen_wd = _gen_dir(workdir, gen)

    if prev is None:
        res = run_dedup(spark, pages, cfg, workdir=gen_wd, resume=False)
    else:
        res = run_dedup_incremental(
            spark,
            pages,
            cfg,
            workdir=gen_wd,
            resume=False,
            base_tables=_base_tables(spark, workdir, prev),
        )
    n = res.assignments.count()
    _commit_latest(workdir, gen, batch_id, n)


def _base_tables(spark: SparkSession, workdir: str, upto_gen: int) -> dict:
    """Assemble the accumulated base state for generation ``upto_gen + 1``.

    prepared/features are the UNION of every generation's batch-only
    snapshot — a metadata-level file union (each generation's parquet is
    immutable, nothing rewritten; the Iceberg upgrade makes this one
    table with appends). assignments come from the latest generation
    only, which the incremental run always commits COMBINED (slim 4-col
    table; its per-generation rewrite is the one O(corpus) cost, upsert
    at the Iceberg seam).
    """
    prepared = [
        spark.read.parquet(os.path.join(_gen_dir(workdir, g), "prepared.parquet"))
        for g in range(upto_gen + 1)
    ]
    features = [
        spark.read.parquet(os.path.join(_gen_dir(workdir, g), "features.parquet"))
        for g in range(upto_gen + 1)
    ]
    from functools import reduce

    return {
        "prepared": reduce(lambda a, b: a.unionByName(b), prepared),
        "features": reduce(lambda a, b: a.unionByName(b), features),
        "assignments": spark.read.parquet(
            os.path.join(_gen_dir(workdir, upto_gen), "assignments.parquet")
        ),
    }


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    workdir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Stream a landing directory of parquet page files into the dedup
    state at ``workdir``. Returns the StreamingQuery.

    ``trigger_available_now=True`` drains everything currently in the
    directory and stops (batch-style backfill, also what tests use);
    ``False`` runs continuously with the default micro-batch trigger.
    """
    os.makedirs(workdir, exist_ok=True)
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        # landing zones commonly contain per-batch SUBDIRECTORIES of part
        # files (each writer commit is a dir); without this the source
        # lists only top-level files and silently sees nothing
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        process_batch(spark, batch_df, workdir, cfg, batch_id=batch_id)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(workdir, "_stream_checkpoint"),
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
