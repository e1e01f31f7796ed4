"""Incremental append-batch dedup vs the full-corpus run.

The contract (incremental.py): per-pair decisions are identical, and the
final partition (cluster membership, min-url cluster ids, A1 canonicals,
sizes) equals a full run over the combined corpus. The corpus is split
even/odd so planted duplicate classes straddle the base/batch boundary —
cross-batch exact dups, near dups, and containment pairs all exercise the
base-attachment paths.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sift_kg_spark import DedupConfig
from sift_kg_spark.incremental import run_dedup_incremental
from sift_kg_spark.pipeline import run_dedup


@pytest.fixture(scope="module")
def split_corpus(corpus):
    pages = corpus[0].drop(columns=["true_text"])
    return pages.iloc[::2].reset_index(drop=True), pages.iloc[1::2].reset_index(
        drop=True
    )


def _assignments_map(df):
    return {
        r["url"]: (r["cluster_id"], r["canonical_url"], r["cluster_size"])
        for r in df.collect()
    }


def test_incremental_matches_full_run(spark, cfg, corpus, split_corpus, tmp_path_factory):
    base_pdf, batch_pdf = split_corpus
    all_pdf = corpus[0].drop(columns=["true_text"])

    wd = tmp_path_factory.mktemp("inc")
    full = run_dedup(
        spark, spark.createDataFrame(all_pdf), cfg, workdir=str(wd / "full")
    )
    base = run_dedup(
        spark, spark.createDataFrame(base_pdf), cfg, workdir=str(wd / "base")
    )
    inc = run_dedup_incremental(
        spark,
        spark.createDataFrame(batch_pdf),
        cfg,
        base_workdir=str(wd / "base"),
        workdir=str(wd / "incr"),
    )

    got = _assignments_map(inc.assignments)
    want = _assignments_map(full.assignments)
    assert set(got) == set(want)
    mismatches = {u: (got[u], want[u]) for u in want if got[u] != want[u]}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"

    # clusters table agrees too
    gc = {r["cluster_id"]: (r["size"], r["canonical_url"])
          for r in inc.clusters.collect()}
    wc = {r["cluster_id"]: (r["size"], r["canonical_url"])
          for r in full.clusters.collect()}
    assert gc == wc

    # the increment never recomputed a base signature: its feature stage
    # holds only shas absent from the base run
    inc_feats = inc.store.read("features").select("url").collect()
    base_urls = set(base_pdf["url"])
    assert all(r["url"] not in base_urls for r in inc_feats)


def test_incremental_empty_batch(spark, cfg, split_corpus, tmp_path_factory):
    base_pdf, batch_pdf = split_corpus
    wd = tmp_path_factory.mktemp("inc_empty")
    base = run_dedup(
        spark, spark.createDataFrame(base_pdf), cfg, workdir=str(wd / "base")
    )
    inc = run_dedup_incremental(
        spark,
        spark.createDataFrame(batch_pdf).limit(0),
        cfg,
        base_workdir=str(wd / "base"),
        workdir=str(wd / "incr"),
    )
    assert _assignments_map(inc.assignments) == _assignments_map(base.assignments)


def test_incremental_requires_base(spark, cfg, split_corpus, tmp_path_factory):
    _, batch_pdf = split_corpus
    wd = tmp_path_factory.mktemp("inc_nobase")
    with pytest.raises(ValueError, match="lacks committed stage|requires base"):
        run_dedup_incremental(
            spark,
            spark.createDataFrame(batch_pdf),
            cfg,
            base_workdir=str(wd / "missing"),
            workdir=str(wd / "incr"),
        )
