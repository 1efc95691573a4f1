"""Round-7 hardening: SemDeDup max_cell_size cap, the numpy-scaled
SemDeDup/trainer pair (the large-k 100 TB path), and exact-vs-scaled
parity on the real embeddings table."""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark.functions.similarity import (
    kmeans_fit,
    kmeans_fit_np,
    semantic_dedup,
    semantic_dedup_scaled,
)


def _hot_cell_df(spark):
    # cell 0 (around [1,0]): 4 near-identical members -> pairs would drop 3.
    # cell 1 (around [-1,0]): 2 near-identical members -> 1 dropped.
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.99, 0.01]),
            (3, [0.98, 0.02]),
            (4, [0.97, 0.03]),
            (10, [-1.0, 0.0]),
            (11, [-0.99, 0.01]),
        ],
        "vec_id long, embedding array<float>",
    )


CENTS = [[1.0, 0.0], [-1.0, 0.0]]


@pytest.mark.parametrize("impl", [semantic_dedup, semantic_dedup_scaled])
def test_semantic_dedup_max_cell_cap(spark, impl):
    """Cells above max_cell_size skip pair expansion (all members kept);
    cells within the cap dedup normally — the one uncapped pair-former
    flagged in rounds 5/6, now guarded like minhash's max_bucket_size."""
    df = _hot_cell_df(spark)
    out = {
        r.vec_id: r.status
        for r in impl(
            df, "vec_id", "embedding", CENTS, threshold=0.9, max_cell_size=3
        ).collect()
    }
    # hot cell (4 members > cap 3): everyone kept despite cosine ~1
    assert all(out[i] == "kept" for i in (1, 2, 3, 4))
    # small cell (2 members <= cap): normal keep-farthest dedup
    assert out[10] == "dropped" and out[11] == "kept"


@pytest.mark.parametrize("impl", [semantic_dedup, semantic_dedup_scaled])
def test_semantic_dedup_default_cap_no_change(spark, impl):
    """With the default (generous) cap both cells dedup as before."""
    df = _hot_cell_df(spark)
    out = {
        r.vec_id: r.status
        for r in impl(df, "vec_id", "embedding", CENTS, threshold=0.9).collect()
    }
    assert sum(1 for s in out.values() if s == "dropped") == 4
    # keep-farthest: the farthest-from-centroid member of each cell survives
    assert out[4] == "kept" and out[11] == "kept"


def test_semantic_dedup_scaled_parity_real_embeddings(spark, sf_dir):
    """The numpy-scaled path must reproduce the exact (oracle-checked)
    path on the real embeddings table: same cells, same rounded centroid
    cosines, same statuses."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_fit(
        emb, "embedding", k=8, iterations=2, portable=True, init_id_col="vec_id"
    )
    exact = {
        r.vec_id: (r.cell, r.c_sim, r.status)
        for r in semantic_dedup(
            emb, "vec_id", "embedding", cents, threshold=0.35
        ).collect()
    }
    scaled = {
        r.vec_id: (r.cell, r.c_sim, r.status)
        for r in semantic_dedup_scaled(
            emb, "vec_id", "embedding", cents, threshold=0.35
        ).collect()
    }
    assert set(exact) == set(scaled)
    diffs = {k: (exact[k], scaled[k]) for k in exact if exact[k] != scaled[k]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {list(diffs.items())[:3]}"


def test_kmeans_fit_np_deterministic_and_shapes(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = kmeans_fit_np(emb, "embedding", k=16, iterations=3)
    c2 = kmeans_fit_np(emb, "embedding", k=16, iterations=3)
    assert c1 == c2
    assert len(c1) == 16 and len(c1[0]) == 64


def test_kmeans_fit_np_sample_smaller_than_k_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="smaller than k"):
        kmeans_fit_np(df, "embedding", k=5)
