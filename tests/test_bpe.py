"""Distributed BPE trainer parity vs a pure-Python reference (same
deterministic tiebreak), apply-kernel consistency, and partition
invariance (functions/bpe.py)."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.bpe import (
    apply_merge_py,
    bpe_apply,
    bpe_tokenize_py,
    bpe_train,
)

TEXTS = [
    "the cat sat on the mat",
    "the cats eat the fish",
    "a cat and a rat ran",
    "that hat is flat",
    "the rat sat on that mat",
]


def ref_bpe_train(texts, num_merges, min_pair_count=2):
    wf = Counter(w for t in texts for w in t.lower().split())
    vocab = {tuple(w): c for w, c in wf.items()}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best_pair, best_n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < min_pair_count:
            break
        a, b = best_pair
        merges.append((a, b))
        vocab = {
            tuple(apply_merge_py(list(s), a, b)): c for s, c in vocab.items()
        }
    return merges


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = bpe_train(df, "text", num_merges=8)
    want = ref_bpe_train(TEXTS, 8)
    assert got == want, (got, want)


def test_bpe_train_driver_matches_distributed_and_reference(spark):
    """The one-job driver trainer must reproduce the distributed trainer's
    merge list exactly (and both the pure-Python reference), including deep
    merge chains where the incremental pair index gets rewritten often."""
    from datagouvfr_data_pipelines_spark.functions.bpe import bpe_train_driver

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    want = ref_bpe_train(TEXTS, 30, min_pair_count=1)
    got_driver = bpe_train_driver(df, "text", num_merges=30, min_pair_count=1)
    assert got_driver == want, (got_driver, want)
    # spot-check the distributed trainer agrees on a shorter horizon (it
    # runs one Spark job per merge, so keep its share small)
    assert bpe_train(df, "text", num_merges=8) == want[:8]


def test_bpe_train_partition_invariant(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    a = bpe_train(df.repartition(7), "text", num_merges=5)
    b = bpe_train(df.coalesce(1), "text", num_merges=5)
    assert a == b


def test_bpe_apply_round_trip_and_consistency(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe_train(df, "text", num_merges=6)
    out = bpe_apply(df, merges, "text").collect()
    assert len(out) == len(TEXTS)
    for row in out:
        # tokens concatenate back to the whitespace-stripped lowercase text
        assert "".join(row["bpe_tokens"]) == row["text"].lower().replace(" ", "")
        # kernel parity word by word
        expect = []
        for w in row["text"].lower().split():
            expect.extend(bpe_tokenize_py(w, merges))
        assert row["bpe_tokens"] == expect


def test_bpe_merges_learn_frequent_pairs(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe_train(df, "text", num_merges=8)
    # 'at' dominates this corpus (cat/sat/mat/rat/that/hat/flat)
    assert ("a", "t") in merges


def test_bpe_query_runs(spark, sf_dir):
    from datagouvfr_data_pipelines_spark import plans

    df = plans.queries()["t_bpe_tokens"](spark, sf_dir)
    rows = df.limit(50).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bpe_tokens"] <= r["n_chars"]
