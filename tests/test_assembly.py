"""Dataset-assembly operators: chunking coverage, split determinism,
stratified-sample stability under repartitioning."""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark.operators.assembly import (
    chunk_documents,
    hash_split,
    stratified_sample,
)


def test_chunk_documents_coverage_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "only three tokens"), (3, "  ")], "doc_id long, text string"
    )
    out = chunk_documents(df, "doc_id", "text", chunk_size=4, overlap=1)
    rows = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens) for r in out.collect()
    )
    # doc 1: starts 1,4,7 -> [w0..w3],[w3..w6],[w6..w9]; every token covered,
    # consecutive chunks share exactly `overlap` tokens
    d1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in d1] == [0, 1, 2]
    assert d1[0][2] == "w0 w1 w2 w3" and d1[1][2] == "w3 w4 w5 w6"
    assert d1[2][2] == "w6 w7 w8 w9" and d1[2][3] == 4
    covered = set()
    for r in d1:
        covered.update(r[2].split())
    assert covered == {f"w{i}" for i in range(10)}
    # doc 2 shorter than one chunk: single short chunk, no token lost
    d2 = [r for r in rows if r[0] == 2]
    assert d2 == [(2, 0, "only three tokens", 3)]
    # whitespace-only doc yields nothing
    assert not [r for r in rows if r[0] == 3]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", chunk_size=4, overlap=4)


def test_hash_split_deterministic_and_content_keyed(spark):
    df = spark.createDataFrame(
        [(1, "some document text"), (2, "other text"), (3, "some document text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.bucket, r.split) for r in hash_split(df, "text").collect()}
    # identical content -> identical split, regardless of id
    assert out[1] == out[3]
    # rerun is bit-identical
    again = {r.doc_id: (r.bucket, r.split) for r in hash_split(df, "text").collect()}
    assert out == again
    assert all(0 <= b < 100 for b, _ in out.values())
    with pytest.raises(ValueError, match="sum to 100"):
        hash_split(df, "text", weights={"train": 50, "val": 10})


def test_stratified_sample_exact_k_and_partition_stable(spark):
    rows = [(i, f"text number {i}", "en" if i % 2 else "fr") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    s1 = sorted(
        (r.doc_id, r.lang)
        for r in stratified_sample(df, "lang", 7, "doc_id", "text").collect()
    )
    s2 = sorted(
        (r.doc_id, r.lang)
        for r in stratified_sample(
            df.repartition(13), "lang", 7, "doc_id", "text"
        ).collect()
    )
    assert s1 == s2  # total order -> partition-layout independent
    from collections import Counter

    per_stratum = Counter(lang for _, lang in s1)
    assert per_stratum == {"en": 7, "fr": 7}


def test_ngram_decontaminate_flags_overlap_only(spark):
    from datagouvfr_data_pipelines_spark.operators.assembly import (
        ngram_decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "hi")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "xx alpha beta gamma yy"),      # shares 3-gram "alpha beta gamma"
            (2, "totally unrelated words here"),  # clean
            (3, "beta gamma delta alpha beta gamma"),  # shares two distinct 3-grams
            (4, "hi"),                           # short doc == short bench item
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_contaminated_ngrams, r.is_contaminated)
        for r in ngram_decontaminate(corpus, bench, "doc_id", "text", n=3).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (2, True)  # "beta gamma delta" + "alpha beta gamma"
    assert out[4] == (1, True)  # whole-text gram matches short eval item
    # every corpus row survives with a flag — it's an annotation, not a filter
    assert set(out) == {1, 2, 3, 4}


def test_budget_select_boundary_and_determinism(spark):
    from datagouvfr_data_pipelines_spark.operators.assembly import budget_select

    rows = [
        ("a", 1, 40),
        ("a", 2, 50),  # starts at 40 < 100: kept even though it crosses 100
        ("a", 3, 30),  # starts at 90 < 100: kept (keep-whole rule)
        ("a", 4, 10),  # starts at 120: dropped
        ("b", 5, 99),
        ("b", 6, 2),   # starts at 99 < 100: kept
    ]
    df = spark.createDataFrame(rows, "dom string, doc_id long, n int")
    out = budget_select(df, "dom", "n", 100, ["doc_id"])
    got = sorted((r.doc_id, r.tokens_before) for r in out.collect())
    assert got == [(1, 0), (2, 40), (3, 90), (5, 0), (6, 99)]
    # partition layout must not change the selected set
    again = sorted(
        (r.doc_id, r.tokens_before)
        for r in budget_select(df.repartition(7), "dom", "n", 100, ["doc_id"]).collect()
    )
    assert got == again
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        budget_select(df, "dom", "n", 0, ["doc_id"])


def test_pack_sequences_bucket_invariant_and_bounds(spark):
    from datagouvfr_data_pipelines_spark.operators.assembly import pack_sequences

    rows = [(d, c, 5 + (d * 7 + c) % 9) for d in range(30) for c in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id int, n int")

    def run(n_buckets):
        out = pack_sequences(
            df, "doc_id", ["doc_id", "chunk_id"], "n", budget=40, n_buckets=n_buckets
        )
        return sorted(
            (r.doc_id, r.chunk_id, r.pack_id, r.pack_offset) for r in out.collect()
        )

    # bucket count is an execution detail: 1 bucket == 8 buckets == 64 buckets
    r1, r8, r64 = run(1), run(8), run(64)
    assert r1 == r8 == r64

    # pack numbering matches the sequential reference exactly
    goff = 0
    for (d, c, pid, poff), (_, _, n) in zip(r1, sorted(rows)):
        assert pid == goff // 40 and poff == goff % 40
        goff += n

    # no pack exceeds budget + max_chunk - 1 tokens
    from collections import defaultdict

    sizes = defaultdict(int)
    for (d, c, pid, _), (_, _, n) in zip(r1, sorted(rows)):
        sizes[pid] += n
    assert max(sizes.values()) <= 40 + 13 - 1


def test_mixture_plan_waterfilling_and_sample(spark):
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.operators.assembly import (
        mixture_plan,
        mixture_sample,
    )

    # domain a: plenty of tokens; domain b: scarce (saturates); c: unweighted
    rows = (
        [(i, "a", 100) for i in range(1000)]
        + [(10_000 + i, "b", 100) for i in range(10)]
        + [(20_000 + i, "c", 100) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "id long, dom string, toks long")
    plan = mixture_plan(
        df, "dom", "toks", {"a": 500000, "b": 500000}, budget_tokens=20_000
    )
    got = {r["domain"]: r for r in plan.collect()}
    assert got["c"]["rate"] == 0.0
    assert got["b"]["rate"] == 1.0  # 10k target > 1k available -> saturates
    # a absorbs the rest of the budget: 19k of its 100k tokens
    assert abs(got["a"]["planned_tokens"] - 19_000) < 1e-6
    assert abs(got["a"]["rate"] - 0.19) < 1e-9

    sampled = mixture_sample(df, plan, "dom", "id")
    counts = {
        r["dom"]: r["n"]
        for r in sampled.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("b") == 10 and "c" not in counts
    assert abs(counts["a"] - 190) / 190 < 0.25  # hash sample near the rate
    # determinism: same input -> identical sample under any partitioning
    again = mixture_sample(df.repartition(7), plan, "dom", "id")
    assert sorted(r["id"] for r in again.collect()) == sorted(
        r["id"] for r in sampled.collect()
    )


def test_dsir_weights_rank_target_like_docs_higher(spark):
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.operators.assembly import (
        dsir_importance_weights,
    )

    # target docs share a vocabulary; the mixed doc overlaps it halfway,
    # the off-domain doc not at all
    rows = [
        (1, "alpha beta gamma alpha beta", "tgt"),
        (2, "beta gamma alpha gamma", "tgt"),
        (3, "alpha beta zork quux", "other"),
        (4, "zork quux blorp zork quux blorp", "other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    w = {
        r["doc_id"]: r["dsir_micro"] / r["n_toks"]
        for r in dsir_importance_weights(
            docs, "doc_id", "text", F.col("dom") == "tgt", n_buckets=64
        ).collect()
    }
    # per-token average log-ratio orders docs by target-likeness
    assert w[1] > w[3] > w[4]
    assert w[2] > w[3]
