"""Product quantization: encode determinism, ADC ordering, recall with and
without exact re-rank."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from datagouvfr_data_pipelines_spark.functions.similarity import (
    pq_encode,
    pq_fit,
    pq_search,
    pq_search_rerank,
)


@pytest.fixture(scope="module")
def emb(spark):
    # sf0.01 (500 vectors): the smoke tier is too small for a meaningful
    # quantization-recall measurement (16 centroids vs ~50 vectors)
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return pq_fit(emb, "embedding", m=4, k=16, iterations=2)


def _exact_top(emb, probe, k):
    rows = emb.select("vec_id", "embedding").collect()
    p = np.array(probe)
    d = sorted(
        (float(((np.array(r.embedding) - p) ** 2).sum()), r.vec_id)
        for r in rows
    )
    return [v for _, v in d[:k]]


def test_pq_fit_shape_and_dim_guard(emb, books):
    assert len(books) == 4
    assert all(len(cb) == 16 for cb in books)
    assert all(len(c) == 16 for cb in books for c in cb)  # 64 / 4 subdims
    with pytest.raises(ValueError):
        pq_fit(emb, "embedding", m=7)


def test_pq_encode_deterministic_and_bounded(emb, books):
    a = {r.vec_id: r.pq_code for r in
         pq_encode(emb.repartition(1), "embedding", books).collect()}
    b = {r.vec_id: r.pq_code for r in
         pq_encode(emb.repartition(9), "embedding", books).collect()}
    assert a == b
    assert all(0 <= c < 16 for code in a.values() for c in code)


def test_pq_adc_recall_and_rerank(emb, books):
    probe = [
        float(x)
        for x in emb.where(F.col("vec_id") == 3).first()["embedding"]
    ]
    enc = pq_encode(emb, "embedding", books)
    adc = [r.vec_id for r in
           pq_search(enc, "vec_id", probe, books, top_k=10).collect()]
    exact = _exact_top(emb, probe, 10)
    assert len(adc) == 10
    # compressed-only pass: lossy but must find a meaningful share
    assert len(set(adc) & set(exact)) >= 3
    # shortlist + exact re-rank restores near-perfect recall
    rr = [r.vec_id for r in
          pq_search_rerank(enc, "embedding", "vec_id", probe, books,
                           top_k=10, shortlist=100).collect()]
    assert len(set(rr) & set(exact)) >= 8
    # the probe itself (vec_id=3, distance 0) must rank first
    assert rr[0] == 3
