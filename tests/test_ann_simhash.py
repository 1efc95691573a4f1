"""k-means IVF index + SimHash banded near-dups + permissive XML."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.similarity import (
    cosine,
    ivf_search,
    kmeans_fit,
    nearest_centroid,
)
from datagouvfr_data_pipelines_spark.io.xml_reader import read_xml
from datagouvfr_data_pipelines_spark.operators.dedup import simhash_neardup_pairs


def test_kmeans_ivf_search(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = kmeans_fit(emb, "embedding", k=8, iterations=2)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    # assignment covers all rows and is stable
    cells = emb.select(nearest_centroid("embedding", centroids).alias("c"))
    counts = {r["c"]: 1 for r in cells.distinct().collect()}
    assert all(0 <= c < 8 for c in counts)

    probe = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    top = ivf_search(emb, "embedding", "vec_id", probe, centroids,
                     n_probe_cells=3, top_k=5).collect()
    assert len(top) == 5
    # the probe vector itself must be its own nearest neighbor
    assert top[0]["vec_id"] == 3 and top[0]["sim"] == 1.0
    # sims sorted descending
    sims = [r["sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with enough probe cells should recover most of the brute-force
    top-k (recall sanity, not exactness)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    parr = F.array(*[F.lit(x) for x in probe])
    brute = [
        r["vec_id"]
        for r in emb.select("vec_id", F.round(cosine("embedding", parr), 6).alias("s"))
        .orderBy(F.col("s").desc(), F.col("vec_id"))
        .limit(10)
        .collect()
    ]
    centroids = kmeans_fit(emb, "embedding", k=8, iterations=2)
    approx = [
        r["vec_id"]
        for r in ivf_search(
            emb, "embedding", "vec_id", probe, centroids, n_probe_cells=4, top_k=10
        ).collect()
    ]
    overlap = len(set(brute) & set(approx))
    assert overlap >= 5, f"recall too low: {overlap}/10"


def test_simhash_neardup_pairs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while birds sing in the morning light across the quiet valley"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " today"),     # near-identical -> tiny hamming
            (3, "completely different content about spark query engines and "
                "distributed joins with shuffles and partitions everywhere"),
        ],
        "doc_id long, text string",
    )
    pairs = simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(p in {(1, 2)} or 3 not in p for p in got)
    # portable (31-bit rolling-hash) search finds the same near pair
    ppairs = simhash_neardup_pairs(
        docs, "doc_id", "text", max_hamming=8, portable=True
    )
    pgot = {(r["id_a"], r["id_b"]) for r in ppairs.collect()}
    assert (1, 2) in pgot
    assert all(p in {(1, 2)} or 3 not in p for p in pgot)


def test_simhash31_exploded_matches_portable(spark):
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        simhash31_exploded,
        simhash31_portable,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta  theta"),
            (4, ""),
        ],
        "doc_id long, text string",
    ).repartition(3)
    got = {
        r["doc"]: r["simhash31"]
        for r in simhash31_exploded(docs, "doc_id", "text").collect()
    }
    want = {
        r["doc_id"]: r["simhash31"]
        for r in simhash31_portable(docs, "doc_id", "text").collect()
    }
    # the exploded production shape agrees with the per-row fold wherever
    # both produce a row; token-less docs (empty text) have no rows to
    # explode and drop out of the agg — the per-row fold keeps them (sig 0)
    assert got == {k: want[k] for k in got}
    assert set(want) - set(got) == {4}


def test_read_xml_permissive(spark, tmp_path):
    (tmp_path / "ok.xml").write_text('<l><pdv id="A"/></l>')
    (tmp_path / "bad.xml").write_text("<unclosed>")
    df = read_xml(
        spark, str(tmp_path) + "/*.xml", "pdv", {"pdv_id": "@id"}, mode="PERMISSIVE"
    )
    rows = df.collect()
    ok = [r for r in rows if r["_corrupt_file"] is None]
    bad = [r for r in rows if r["_corrupt_file"] is not None]
    assert len(ok) == 1 and ok[0]["pdv_id"] == "A"
    assert len(bad) == 1 and "bad.xml" in bad[0]["source_file"]


def test_knn_join_bucket_invariant_and_self_match(spark, sf_dir):
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.functions.similarity import knn_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p")
    )

    def run(fan):
        out = knn_join(emb, "embedding", "vec_id", probes, "probe_id", "p",
                       k=4, fan_buckets=fan)
        return sorted((r.probe_id, r.vec_id, r.sim, r.rank) for r in out.collect())

    r1, r8 = run(1), run(8)
    assert r1 == r8  # fan-out is an execution detail
    # every probe's rank-1 neighbor is itself (cosine 1.0)
    firsts = {p: v for p, v, s, rk in r1 if rk == 1}
    assert firsts == {0: 0, 1: 1, 2: 2}
    assert all(rk <= 4 for _, _, _, rk in r1)


def test_pca_fit_matches_numpy_and_is_orthonormal(spark, sf_dir):
    import numpy as np

    from datagouvfr_data_pipelines_spark.functions.similarity import (
        pca_fit,
        pca_transform,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comps, mean, var = pca_fit(emb, "embedding", k=4)
    W = np.asarray(comps)
    # orthonormal basis, descending explained variance
    assert np.allclose(W @ W.T, np.eye(4), atol=1e-8)
    assert all(a >= b - 1e-12 for a, b in zip(var, var[1:]))

    # parity with plain numpy PCA on the collected data
    X = np.stack([r["embedding"] for r in emb.select("embedding").collect()]).astype(
        np.float64
    )
    mu = X.mean(axis=0)
    assert np.allclose(mu, mean, atol=1e-9)
    cov = np.cov(X, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, np.argsort(evals)[::-1][:4]].T
    for i in range(4):  # same subspace: rows agree up to sign
        dot = abs(float(np.dot(W[i], top[i])))
        assert dot > 1 - 1e-6, (i, dot)
    assert np.allclose(np.sort(evals)[::-1][:4], var, rtol=1e-6)

    # projection path (JVM folds) == numpy projection
    proj = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca_transform(emb, "embedding", comps, mean).select(
            "vec_id", "pca"
        ).collect()
    }
    ref = (X - mu) @ W.T
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    got = np.stack([proj[i] for i in ids])
    assert np.allclose(got, ref, atol=1e-8)

    # partition invariance within float tolerance
    comps2, mean2, _ = pca_fit(emb.repartition(7), "embedding", k=4)
    assert np.allclose(np.asarray(comps2), W, atol=1e-6)
