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


def test_curate_corpus_line_dedup_and_span_stages(spark):
    from datagouvfr_data_pipelines_spark.pipelines.corpus import curate_corpus

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            # survives everything; its lines are the canonical copies
            (1, f"unique opening line words here\n{boiler}"),
            # all lines already seen in doc 1 -> dropped at line_dedup
            (2, f"unique opening line words here\n{boiler}"),
            # one fresh line + one seen line -> survives with fresh line only
            (3, f"{boiler}\nanother totally different closing line here now"),
            # mostly duplicated 8-token spans of doc 1's boilerplate
            (4, f"{boiler} {boiler}"),
        ],
        "doc_id int, text string",
    )
    out = curate_corpus(
        docs,
        min_quality=0.0,
        neardup_threshold=0.95,
        dedup_lines=True,
        # doc 1 scores exactly 10/20=0.5 (its boilerplate line is copied by
        # doc 4), doc 4 scores 10/17~0.588 — the threshold splits them
        max_dup_span_frac=0.55,
    )
    kept = {r.doc_id: r.text for r in out["kept"].collect()}
    stages = {r.doc_id: r.stage for r in out["dropped"].collect()}
    assert stages[2] == "line_dedup"
    assert 1 in kept
    # doc 3 kept, rewritten to only its surviving line
    assert kept[3] == "another totally different closing line here now"
    # doc 4 is a span-composite of doc 1's text -> dup_spans stage
    assert stages[4] == "dup_spans"
    # ledger conservation still holds with the new stages
    assert len(kept) + len(stages) == 4


def test_model_quality_stage_splits_with_ledger(spark):
    """Optional classifier gate: survivors + dropped must exactly
    partition the heuristic-quality survivors, with a dedicated
    'model_quality' ledger stage; off by default (no stage emitted)."""
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.pipelines.corpus import curate_corpus

    rows = []
    for i in range(40):
        good = "the quick brown fox jumps over the lazy dog and keeps running " * 4
        bad = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))" * 3
        rows.append((i, good if i % 2 == 0 else bad))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = curate_corpus(docs, model_quality_threshold=0.5)
    stages = {r["stage"] for r in out["dropped"].select("stage").distinct().collect()}
    kept_ids = {r["doc_id"] for r in out["kept"].collect()}
    model_dropped = {
        r["doc_id"]
        for r in out["dropped"].where(F.col("stage") == "model_quality").collect()
    }
    # every doc lands exactly once across kept + ledger
    all_dropped = {r["doc_id"] for r in out["dropped"].collect()}
    assert kept_ids | all_dropped == set(range(40))
    assert kept_ids & all_dropped == set()
    # the model agrees with the teacher on this cleanly-separated corpus
    assert model_dropped == set()
    assert "quality" in stages

    # stage absent when the gate is off
    base = curate_corpus(docs)
    base_stages = {
        r["stage"] for r in base["dropped"].select("stage").distinct().collect()
    }
    assert "model_quality" not in base_stages


def test_curate_corpus_dsir_stage(spark):
    """DSIR selection drops surviving docs whose token profile is far from
    the target-language domain; the ledger names the stage and the
    conservation invariant holds."""
    en_doc = (
        "the quick analysis shows that the data and the methods are "
        "consistent with the expected results and the overall findings "
    ) * 3
    es_doc = (
        "el estudio de los datos que se presentan y la metodologia de "
        "el proyecto son una parte de la revision de los resultados "
    ) * 3
    docs = spark.createDataFrame(
        [(1, en_doc), (2, en_doc + " further remarks follow here"),
         (3, es_doc), (4, es_doc + " con una nota final adicional")],
        "doc_id long, text string",
    )
    out = curate_corpus(
        docs,
        min_quality=0.0,
        neardup_threshold=0.99,
        dsir_target_lang="en",
        dsir_min_micro_per_token=0,
    )
    kept_ids = sorted(r["doc_id"] for r in out["kept"].collect())
    stages = {r["doc_id"]: r["stage"] for r in out["dropped"].collect()}
    assert set(kept_ids) <= {1, 2} and 1 in kept_ids
    assert all(v == "dsir" for k, v in stages.items() if k in (3, 4))
    assert out["kept"].count() + out["dropped"].count() == docs.count()
