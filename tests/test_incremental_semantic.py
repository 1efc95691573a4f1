"""Incremental SemDeDup: batch-vs-index semantics and the streaming loop.

Mirrors test_incremental_dedup.py for the embedding tier
(operators/incremental_semantic.py, streaming/semantic_stream.py)."""

import glob as globmod
import os
import shutil

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.incremental_semantic import (
    build_semantic_index,
    incremental_semantic_dedup,
)

CENTS = [[1.0, 0.0], [-1.0, 0.0]]
SCHEMA = "vec_id long, embedding array<float>"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_index_schema(spark):
    idx = build_semantic_index(
        _df(spark, [(1, [1.0, 0.0]), (2, [-1.0, 0.0])]),
        "vec_id",
        "embedding",
        CENTS,
    )
    rows = {r["doc"]: r for r in idx.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["cell"] == 0 and rows[2]["cell"] == 1
    assert rows[1]["c_sim"] == 1.0 and rows[1]["nrm"] == 1.0
    assert list(idx.columns) == ["doc", "cell", "vec", "nrm", "c_sim"]


def test_incremental_semantic_reasons_and_precedence(spark):
    # corpus occupies cell 0 only; cell 1 is corpus-free
    corpus = _df(spark, [(1, [1.0, 0.0])])
    idx = build_semantic_index(corpus, "vec_id", "embedding", CENTS)
    batch = _df(
        spark,
        [
            (10, [0.99, 0.01]),   # near corpus 1 -> near_corpus
            (15, [0.985, 0.015]),  # near corpus AND near 10 -> near_corpus wins
            (12, [-0.99, 0.01]),  # batch pair in the corpus-free cell ...
            (13, [-0.98, 0.02]),  # ... keep-farthest keeps 13, drops 12
            (14, [0.3, 0.95]),    # cell 0 but far from everything -> survived
        ],
    )
    res = incremental_semantic_dedup(
        batch, idx, "vec_id", "embedding", CENTS, threshold=0.9
    )
    ledger = {r["doc"]: r["reason"] for r in res.ledger.collect()}
    # precedence: 10 and 15 are mutual batch near-dups too, but the corpus
    # reason must win and near_batch must NOT double-report them
    assert ledger == {10: "near_corpus", 15: "near_corpus", 12: "near_batch"}
    assert sorted(r["vec_id"] for r in res.survivors.collect()) == [13, 14]
    assert sorted(r["doc"] for r in res.index_rows.collect()) == [13, 14]


def test_oversized_corpus_cell_skips_with_member_kept(spark):
    corpus = _df(
        spark, [(1, [1.0, 0.0]), (2, [0.99, 0.01]), (3, [0.98, 0.02])]
    )
    idx = build_semantic_index(corpus, "vec_id", "embedding", CENTS)
    batch = _df(spark, [(10, [0.995, 0.005])])  # near every corpus member
    res = incremental_semantic_dedup(
        batch, idx, "vec_id", "embedding", CENTS, threshold=0.9, max_cell_size=2
    )
    # corpus cell 0 has 3 members > cap 2: comparison skipped, doc kept
    assert res.ledger.count() == 0
    assert [r["vec_id"] for r in res.survivors.collect()] == [10]
    # within the cap the same doc is dropped
    res2 = incremental_semantic_dedup(
        batch, idx, "vec_id", "embedding", CENTS, threshold=0.9, max_cell_size=3
    )
    assert {r["doc"]: r["reason"] for r in res2.ledger.collect()} == {
        10: "near_corpus"
    }


def test_survivors_chain_into_next_batch(spark):
    """A survivor's index row must make the NEXT batch's duplicate of it a
    near_corpus drop — the whole point of the incremental index."""
    corpus = _df(spark, [(1, [1.0, 0.0])])
    idx = build_semantic_index(corpus, "vec_id", "embedding", CENTS)
    b1 = _df(spark, [(10, [-0.99, 0.01])])  # corpus-free cell: survives
    r1 = incremental_semantic_dedup(
        b1, idx, "vec_id", "embedding", CENTS, threshold=0.9
    )
    assert [r["vec_id"] for r in r1.survivors.collect()] == [10]
    grown = idx.unionByName(r1.index_rows)
    b2 = _df(spark, [(20, [-0.985, 0.015])])  # near batch-1 survivor 10
    r2 = incremental_semantic_dedup(
        b2, grown, "vec_id", "embedding", CENTS, threshold=0.9
    )
    assert {r["doc"]: r["reason"] for r in r2.ledger.collect()} == {
        20: "near_corpus"
    }


def test_semantic_ingest_stream_two_drains_and_replay(spark, tmp_path):
    from datagouvfr_data_pipelines_spark.streaming.semantic_stream import (
        semantic_ingest_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    def land(df, name):
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    land(_df(spark, [(1, [1.0, 0.0]), (2, [-1.0, 0.0])]), "f1.parquet")
    kw = dict(
        schema=SCHEMA,
        id_col="vec_id",
        vec_col="embedding",
        centroids=CENTS,
        corpus_dir=corpus_dir,
        index_dir=index_dir,
        checkpoint_dir=ckpt,
        threshold=0.9,
    )
    semantic_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(corpus_dir).collect()
    ) == [1, 2]

    # second drain: one near-dup of an indexed vector, one fresh direction
    land(_df(spark, [(10, [0.99, 0.01]), (11, [0.3, 0.95])]), "f2.parquet")
    semantic_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(corpus_dir).collect()
    ) == [1, 2, 11]
    assert sorted(
        r["doc"] for r in spark.read.parquet(index_dir).collect()
    ) == [1, 2, 11]

    # watermark lives inside the index dir, atomic with the swap
    wm = os.path.join(index_dir, "_last_batch")
    assert os.path.exists(wm)

    # replay: wipe the checkpoint so every file re-delivers with batch ids
    # <= the watermark; the sink must no-op, not re-dedup a batch against
    # an index that already holds its own vectors
    shutil.rmtree(ckpt)
    semantic_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(corpus_dir).collect()
    ) == [1, 2, 11]
    assert sorted(
        r["doc"] for r in spark.read.parquet(index_dir).collect()
    ) == [1, 2, 11]


def test_scaled_incremental_parity_real_embeddings(spark, sf_dir):
    """The numpy-scaled incremental path must reproduce the exact
    (oracle-checked) path's decisions on the real embeddings table."""
    from datagouvfr_data_pipelines_spark.functions.similarity import kmeans_fit
    from datagouvfr_data_pipelines_spark.operators.incremental_semantic import (
        build_semantic_index_scaled,
        incremental_semantic_dedup_scaled,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_fit(
        emb, "embedding", k=8, iterations=2, portable=True, init_id_col="vec_id"
    )
    corpus = emb.where(F.col("vec_id") % 4 != 3)
    batch = emb.where(F.col("vec_id") % 4 == 3)

    exact = incremental_semantic_dedup(
        batch,
        build_semantic_index(corpus, "vec_id", "embedding", cents),
        "vec_id",
        "embedding",
        cents,
        threshold=0.35,
    )
    scaled = incremental_semantic_dedup_scaled(
        batch,
        build_semantic_index_scaled(corpus, "vec_id", "embedding", cents),
        "vec_id",
        "embedding",
        cents,
        threshold=0.35,
    )
    el = {r["doc"]: r["reason"] for r in exact.ledger.collect()}
    sl = {r["doc"]: r["reason"] for r in scaled.ledger.collect()}
    assert el == sl
    assert sorted(r["vec_id"] for r in exact.survivors.collect()) == sorted(
        r["vec_id"] for r in scaled.survivors.collect()
    )
    spark.catalog.clearCache()


def test_scaled_corpus_kernel_cap_and_zero_norm(spark):
    """Scaled corpus tier: oversized corpus cells skip (members kept) and
    zero-norm vectors never match anything (cosine defined 0.0)."""
    from datagouvfr_data_pipelines_spark.operators.incremental_semantic import (
        build_semantic_index_scaled,
        incremental_semantic_dedup_scaled,
    )

    corpus = _df(
        spark, [(1, [1.0, 0.0]), (2, [0.99, 0.01]), (3, [0.98, 0.02])]
    )
    idx = build_semantic_index_scaled(corpus, "vec_id", "embedding", CENTS)
    batch = _df(spark, [(10, [0.995, 0.005]), (11, [0.0, 0.0])])
    res = incremental_semantic_dedup_scaled(
        batch, idx, "vec_id", "embedding", CENTS, threshold=0.9, max_cell_size=2
    )
    # corpus cell over the cap: 10 kept despite cosine ~1; zero-norm 11 kept
    assert res.ledger.count() == 0
    assert sorted(r["vec_id"] for r in res.survivors.collect()) == [10, 11]
    res2 = incremental_semantic_dedup_scaled(
        batch, idx, "vec_id", "embedding", CENTS, threshold=0.9, max_cell_size=3
    )
    assert {r["doc"]: r["reason"] for r in res2.ledger.collect()} == {
        10: "near_corpus"
    }
    spark.catalog.clearCache()


def test_semantic_stream_scaled_two_drains(spark, tmp_path):
    """The scaled=True stream must make the same decisions through the
    GEMM path (same drains as the expression-path stream test)."""
    from datagouvfr_data_pipelines_spark.streaming.semantic_stream import (
        semantic_ingest_stream,
    )

    src = tmp_path / "src"
    src.mkdir()

    def land(df, name):
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    kw = dict(
        schema=SCHEMA,
        id_col="vec_id",
        vec_col="embedding",
        centroids=CENTS,
        corpus_dir=str(tmp_path / "corpus"),
        index_dir=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.9,
        scaled=True,
    )
    land(_df(spark, [(1, [1.0, 0.0]), (2, [-1.0, 0.0])]), "f1.parquet")
    semantic_ingest_stream(spark, str(src), **kw)
    land(_df(spark, [(10, [0.99, 0.01]), (11, [0.3, 0.95])]), "f2.parquet")
    semantic_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    ) == [1, 2, 11]
    idx = spark.read.parquet(str(tmp_path / "index"))
    assert sorted(r["doc"] for r in idx.collect()) == [1, 2, 11]
    # scaled index stores GEMM-path float64 vectors
    assert dict(idx.dtypes)["vec"] == "array<double>"


def test_semantic_stream_recovers_torn_swap(spark, tmp_path):
    """Crash between the two swap renames leaves the semantic index only
    under __old; the restart must roll it forward (shared machinery with
    the text tier — this pins the WIRING, not just the helper)."""
    from datagouvfr_data_pipelines_spark.streaming.semantic_stream import (
        semantic_ingest_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")

    def land(df, name):
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    kw = dict(
        schema=SCHEMA,
        id_col="vec_id",
        vec_col="embedding",
        centroids=CENTS,
        corpus_dir=str(tmp_path / "corpus"),
        index_dir=index_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.9,
    )
    land(_df(spark, [(1, [1.0, 0.0])]), "f1.parquet")
    semantic_ingest_stream(spark, str(src), **kw)

    # torn layout: rename #1 done, rename #2 never ran
    os.rename(index_dir, index_dir + "__old")
    os.makedirs(index_dir + "__tmp_swap")
    with open(os.path.join(index_dir + "__tmp_swap", "junk"), "w") as fh:
        fh.write("stale")

    # a near-dup of vector 1 arrives; only the RESTORED index catches it
    land(_df(spark, [(30, [0.99, 0.01])]), "f2.parquet")
    semantic_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    ) == [1], "near-dup slipped through: index history was lost"
    assert sorted(
        r["doc"] for r in spark.read.parquet(index_dir).collect()
    ) == [1]
    assert not os.path.exists(index_dir + "__old")
    assert not os.path.exists(index_dir + "__tmp_swap")
