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


def test_incremental_hot_buckets_match_full_run(spark, tmp_path_factory):
    """r2 ADVICE (medium): with hot_band_cap tiny, most LSH buckets take
    the star path — dup families straddling base/batch must still land in
    one cluster, exactly as the full run clusters them. Pre-fix, a hot
    bucket whose global-min uid was a NEW doc emitted zero new<->base
    pairs and split such families."""
    from sift_kg_spark.fixtures import generate_corpus

    hot_cfg = DedupConfig(hot_band_cap=2)
    pages_pdf = generate_corpus(160, seed=11)[0].drop(columns=["true_text"])
    base_pdf = pages_pdf.iloc[::2].reset_index(drop=True)
    batch_pdf = pages_pdf.iloc[1::2].reset_index(drop=True)

    wd = tmp_path_factory.mktemp("inc_hot")
    full = run_dedup(
        spark, spark.createDataFrame(pages_pdf), hot_cfg,
        workdir=str(wd / "full"),
    )
    run_dedup(
        spark, spark.createDataFrame(base_pdf), hot_cfg,
        workdir=str(wd / "base"),
    )
    inc = run_dedup_incremental(
        spark,
        spark.createDataFrame(batch_pdf),
        hot_cfg,
        base_workdir=str(wd / "base"),
        workdir=str(wd / "incr"),
    )
    got = _assignments_map(inc.assignments)
    want = _assignments_map(full.assignments)
    assert set(got) == set(want)
    mism = {u: (got[u], want[u]) for u in want if got[u] != want[u]}
    assert not mism, f"{len(mism)} mismatches, e.g. {list(mism.items())[:3]}"


def test_incremental_candidates_skip_base_features(
    spark, cfg, corpus, tmp_path_factory
):
    """VERDICT r2 #1: the increment's candidate plan must read the base
    run's committed KEY snapshot, never the base feature table, and its
    base-side key volume must track the touched buckets, not the corpus."""
    from sift_kg_spark.incremental import incremental_candidates
    from sift_kg_spark.operators.lsh import explode_keys
    from sift_kg_spark.pipeline import run_context
    from sift_kg_spark.tableio import StageStore

    pages_pdf = corpus[0].drop(columns=["true_text"])
    base_pdf = pages_pdf.iloc[:-10].reset_index(drop=True)
    batch_pdf = pages_pdf.iloc[-10:].reset_index(drop=True)

    wd = tmp_path_factory.mktemp("inc_plan")
    base_wd = str(wd / "base")
    run_dedup(spark, spark.createDataFrame(base_pdf), cfg, workdir=base_wd)
    inc = run_dedup_incremental(
        spark,
        spark.createDataFrame(batch_pdf),
        cfg,
        base_workdir=base_wd,
        workdir=str(wd / "incr"),
    )

    base = StageStore(spark, base_wd, context=run_context(cfg))
    assert base.exists("keys"), "run_dedup must commit the key snapshot"
    base_keys = base.read("keys")
    new_keys = explode_keys(inc.store.read("features"), cfg)
    cand = incremental_candidates(new_keys, base_keys, cfg)

    plan = cand._jdf.queryExecution().toString()
    base_features_path = f"{base_wd}/features.parquet"
    assert base_features_path not in plan, (
        "incremental candidate plan re-reads the base FEATURE table"
    )
    assert f"{base_wd}/keys.parquet" in plan

    # base-side rows entering the exchange ~ O(touched buckets)
    key_cols = ["lang", "key"] if cfg.partition_by_lang else ["key"]
    touched = base_keys.join(
        new_keys.select(*key_cols).distinct(), key_cols, "leftsemi"
    ).count()
    total = base_keys.count()
    assert touched < 0.3 * total, (touched, total)


def test_incremental_rejects_stale_feature_format(spark, cfg):
    """r2 ADVICE: a base written under the old int64-shingle format must
    be rejected, not silently union-coerced into ~0 Jaccards."""
    from sift_kg_spark.incremental import check_base_features_schema

    bad = spark.sql(
        "SELECT CAST(1 AS BIGINT) doc_uid, 'en' lang, "
        "array(CAST(1 AS BIGINT)) shingles, CAST(7 AS BIGINT) simhash, "
        "array(CAST(3 AS BIGINT)) keys"
    )
    with pytest.raises(ValueError, match="incompatible feature format"):
        check_base_features_schema(bad)

    good = spark.sql(
        "SELECT CAST(1 AS BIGINT) doc_uid, 'en' lang, "
        "array(CAST(1 AS INT)) shingles, CAST(7 AS BIGINT) simhash, "
        "array(CAST(3 AS BIGINT)) keys"
    )
    check_base_features_schema(good)  # current format passes


def test_incremental_rejects_corpus_stateful_tiers(spark, tmp_path_factory):
    """span_dedup / capture_dedup count state over the WHOLE corpus; a
    batch-local application silently diverges from the full-run equality
    contract, so incremental mode must refuse them loudly."""
    import pytest

    from sift_kg_spark import DedupConfig
    from sift_kg_spark.fixtures import generate_corpus
    from sift_kg_spark.incremental import run_dedup_incremental

    pages_pdf = generate_corpus(40, seed=3)[0].drop(columns=["true_text"])
    batch = spark.createDataFrame(pages_pdf.iloc[:10])
    for bad in (
        DedupConfig(span_dedup=True),
        DedupConfig(capture_dedup=True),
    ):
        with pytest.raises(ValueError, match="corpus-stateful"):
            run_dedup_incremental(
                spark,
                batch,
                bad,
                base_tables={
                    "prepared": batch.limit(0),
                    "features": batch.limit(0),
                    "assignments": batch.limit(0),
                },
            )
