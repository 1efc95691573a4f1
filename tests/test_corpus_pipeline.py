"""Corpus curation pipeline end-to-end on synthetic docs."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.pipelines.corpus import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs on through the field "
    "to find a quiet place in the sun where it can rest for a while today"
)


def test_curate_corpus_stages(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD),                           # keeper
            (2, GOOD),                           # exact dup of 1
            (3, GOOD + " extra tail words here"),  # near-dup of 1
            (4, "x"),                            # fails quality (too short)
            (5, "palabra el los que de y " * 12),  # spanish-ish markers
        ],
        "doc_id long, text string",
    )
    out = curate_corpus(
        docs, min_quality=0.5, keep_langs=["en"], neardup_threshold=0.5
    )
    kept_ids = sorted(r["doc_id"] for r in out["kept"].collect())
    assert kept_ids == [1]
    stages = {r["doc_id"]: r["stage"] for r in out["dropped"].collect()}
    assert stages[4] == "quality"
    assert stages[5] == "language"
    assert stages[2] == "exact_dup"
    assert stages[3] == "near_dup"
    stats = out["stats"].collect()[0]
    assert stats["n_docs"] == 1 and stats["n_tokens"] > 20
    # conservation: kept + dropped == input
    assert out["kept"].count() + out["dropped"].count() == docs.count()


def test_curate_corpus_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curate_corpus(docs, min_quality=0.3, neardup_threshold=0.6)
    n_in = docs.count()
    n_kept = out["kept"].count()
    n_dropped = out["dropped"].count()
    assert n_kept + n_dropped == n_in
    assert n_kept > 0
    # deterministic across runs
    again = curate_corpus(docs, min_quality=0.3, neardup_threshold=0.6)
    assert sorted(r["doc_id"] for r in again["kept"].collect()) == sorted(
        r["doc_id"] for r in out["kept"].collect()
    )


def test_curate_corpus_repetition_and_pii_stages(spark):
    repetitive = "spam spam spam spam spam spam " * 10 + GOOD
    with_pii = GOOD + " contact me at someone@example.org for details"
    docs = spark.createDataFrame(
        [(1, GOOD), (2, repetitive), (3, with_pii)],
        "doc_id long, text string",
    )
    out = curate_corpus(
        docs,
        min_quality=0.5,
        neardup_threshold=0.95,
        max_top_bigram_frac=0.3,
        scrub_pii=True,
    )
    stages = {r["doc_id"]: r["stage"] for r in out["dropped"].collect()}
    assert stages.get(2) == "repetition"
    kept = {r["doc_id"]: r["text"] for r in out["kept"].collect()}
    assert 1 in kept and 3 in kept
    assert "<EMAIL>" in kept[3] and "someone@example.org" not in kept[3]
    assert kept[1] == GOOD  # no-PII text unchanged
    assert out["kept"].count() + out["dropped"].count() == docs.count()
