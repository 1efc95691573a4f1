"""Incremental dedup: batch-vs-index semantics and the streaming ingest loop."""

import os

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.incremental_dedup import (
    build_dedup_index,
    incremental_dedup,
)

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_A_NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
DOC_B = "completely different text about distributed query engines and shuffles"
FRESH = "a genuinely novel document with entirely fresh content and words"


def _corpus(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, "   ")], ["doc_id", "body"]
    )


def test_index_schema_and_empty_doc(spark):
    idx = build_dedup_index(_corpus(spark), "doc_id", "body")
    rows = {r["doc"]: r for r in idx.collect()}
    assert set(rows) == {1, 2, 3}
    assert len(rows[1]["sig"]) == 64 and len(rows[1]["band_hashes"]) == 8
    # whitespace-only doc: sha of empty string, never enters the LSH path
    import hashlib

    assert rows[3]["content_sha"] == hashlib.sha256(b"").hexdigest()


def test_incremental_dedup_reasons(spark):
    idx = build_dedup_index(_corpus(spark), "doc_id", "body")
    batch = spark.createDataFrame(
        [
            (10, DOC_A),  # exact dup of corpus doc 1
            (11, DOC_A_NEAR),  # near dup of corpus doc 1
            (12, FRESH),
            (13, FRESH),  # exact dup of 12 within the batch
            (15, "\t "),  # normalizes to same empty sha as corpus doc 3
        ],
        ["doc_id", "body"],
    )
    res = incremental_dedup(batch, idx, "doc_id", "body", threshold=0.7)
    ledger = {r["doc"]: r["reason"] for r in res.ledger.collect()}
    assert ledger == {
        10: "exact_corpus",
        11: "near_corpus",
        13: "exact_batch",
        15: "exact_corpus",
    }
    assert [r["doc_id"] for r in res.survivors.orderBy("doc_id").collect()] == [12]
    assert [r["doc"] for r in res.index_rows.collect()] == [12]


def test_reingest_everything_drops(spark):
    """Idempotence: re-ingesting an already-curated batch drops every doc."""
    corpus = _corpus(spark)
    idx = build_dedup_index(corpus, "doc_id", "body")
    reid = corpus.select((F.col("doc_id") + 100).alias("doc_id"), "body")
    res = incremental_dedup(reid, idx, "doc_id", "body")
    assert res.survivors.count() == 0
    assert res.ledger.where(F.col("reason") == "exact_corpus").count() == 3


def test_streaming_ingest_two_drains_and_replay(spark, tmp_path):
    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        dedup_ingest_stream,
    )

    import glob as globmod
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, body string"

    def land(df, name):
        # single flat parquet FILE (the file stream source lists flat files)
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    land(spark.createDataFrame([(1, DOC_A), (2, DOC_B)], schema), "f1.parquet")
    kw = dict(
        schema=schema,
        id_col="doc_id",
        text_col="body",
        corpus_dir=corpus_dir,
        index_dir=index_dir,
        checkpoint_dir=ckpt,
        threshold=0.7,
    )
    dedup_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()
    ) == [1, 2]

    # second drain: one exact dup, one near dup, one fresh
    land(
        spark.createDataFrame([(10, DOC_A), (11, DOC_A_NEAR), (12, FRESH)], schema),
        "f2.parquet",
    )
    dedup_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()
    ) == [1, 2, 12]
    idx = spark.read.parquet(index_dir)
    assert sorted(r["doc"] for r in idx.collect()) == [1, 2, 12]

    # third drain with nothing new: checkpoint ledger yields zero batches
    dedup_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()
    ) == [1, 2, 12]
    # watermark lives INSIDE the index dir (atomic with the swap) and
    # matches the last applied batch
    wm = os.path.join(index_dir, "_last_batch")
    assert os.path.exists(wm)
    with open(wm) as fh:
        last_applied = int(fh.read().strip())
    assert last_applied >= 1

    # replay safety: wipe the checkpoint so Spark re-delivers every file as
    # fresh batch ids <= the watermark; the sink must no-op (watermark
    # check), NOT re-dedup the batch against an index that already holds
    # its own fingerprints (which would overwrite survivors with 0 rows —
    # the round-3 crash-window bug).
    shutil.rmtree(ckpt)
    dedup_ingest_stream(spark, str(src), **kw)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()
    ) == [1, 2, 12]
    assert sorted(
        r["doc"] for r in spark.read.parquet(index_dir).collect()
    ) == [1, 2, 12]


def test_dedup_stream_recovers_torn_swap_without_losing_index(spark, tmp_path):
    """Crash between the two swap renames leaves the fingerprint index only
    under ``__old``. A restart must roll it FORWARD — not read watermark -1,
    rebuild an empty index, and rmtree the only surviving copy (round-4
    ADVICE medium). Simulates the exact torn layout, replays, and asserts
    the accumulated dedup history survives."""
    import glob as globmod
    import shutil

    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        dedup_ingest_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, body string"

    def land(df, name):
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    land(spark.createDataFrame([(1, DOC_A), (2, DOC_B)], schema), "f1.parquet")
    kw = dict(
        schema=schema,
        id_col="doc_id",
        text_col="body",
        corpus_dir=corpus_dir,
        index_dir=index_dir,
        checkpoint_dir=ckpt,
        threshold=0.7,
    )
    dedup_ingest_stream(spark, str(src), **kw)
    history = sorted(r["doc"] for r in spark.read.parquet(index_dir).collect())
    assert history == [1, 2]

    # simulate the crash window: rename #1 done (index only under __old),
    # rename #2 never ran (a stale complete tmp is also left behind)
    os.rename(index_dir, index_dir + "__old")
    os.makedirs(index_dir + "__tmp_swap")
    with open(os.path.join(index_dir + "__tmp_swap", "junk"), "w") as fh:
        fh.write("stale")

    # an exact dup of DOC_A arrives as a NEW batch; only the RESTORED index
    # can catch it — without recovery the sink reads watermark -1, builds an
    # empty index, lets the dup through, and rmtree's the only copy of the
    # history under __old
    land(spark.createDataFrame([(30, DOC_A)], schema), "f2.parquet")
    dedup_ingest_stream(spark, str(src), **kw)

    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()
    ) == [1, 2], "duplicate slipped through: fingerprint history was lost"
    assert sorted(
        r["doc"] for r in spark.read.parquet(index_dir).collect()
    ) == [1, 2]
    assert not os.path.exists(index_dir + "__old")
    assert not os.path.exists(index_dir + "__tmp_swap")


def test_sibling_index_dirs_do_not_share_watermark(spark, tmp_path):
    """Two dedup streams whose index dirs share a parent must keep
    independent watermarks (round-3 ADVICE: a parent-level _last_batch was
    shared, so one stream's commit made the other skip batches)."""
    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        dedup_ingest_stream,
    )

    import glob as globmod
    import shutil

    schema = "doc_id long, body string"

    def land(df, src, name):
        stage = str(tmp_path / "stage2")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    parent = tmp_path / "shared"
    parent.mkdir()
    out = {}
    for stream in ("a", "b"):
        src = tmp_path / f"src_{stream}"
        src.mkdir()
        land(
            spark.createDataFrame([(1, DOC_A), (2, DOC_B)], schema),
            src,
            "f1.parquet",
        )
        kw = dict(
            schema=schema,
            id_col="doc_id",
            text_col="body",
            corpus_dir=str(tmp_path / f"corpus_{stream}"),
            index_dir=str(parent / f"index_{stream}"),
            checkpoint_dir=str(tmp_path / f"ckpt_{stream}"),
            threshold=0.7,
        )
        out[stream] = kw
        # stream A commits batch 0 first; stream B's batch 0 must still run
        dedup_ingest_stream(spark, str(src), **kw)

    for stream in ("a", "b"):
        assert sorted(
            r["doc_id"]
            for r in spark.read.parquet(out[stream]["corpus_dir"]).collect()
        ) == [1, 2], f"stream {stream} lost its batch to a shared watermark"


def test_watermarked_dedup_stream(spark, tmp_path):
    import glob as globmod
    import shutil

    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        watermarked_dedup_stream,
    )

    src = tmp_path / "wsrc"
    src.mkdir()
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")
    schema = "k string, ts timestamp, v long"

    def land(rows, name):
        stage = str(tmp_path / "wstage")
        (
            spark.createDataFrame(rows, "k string, ts string, v long")
            .selectExpr("k", "cast(ts as timestamp) ts", "v")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    land(
        [
            ("a", "2024-01-01 10:00:00", 1),
            ("a", "2024-01-01 10:05:00", 2),  # duplicate key within delay
            ("b", "2024-01-01 10:01:00", 3),
        ],
        "f1.parquet",
    )
    kw = dict(
        schema=schema,
        key_cols=["k"],
        ts_col="ts",
        delay="1 hour",
        out_dir=out,
        checkpoint_dir=ckpt,
    )
    watermarked_dedup_stream(spark, str(src), **kw)
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(out).collect())
    assert got == [("a", 1), ("b", 3)]

    # second drain: state in the checkpoint still remembers key "a"
    land([("a", "2024-01-01 10:10:00", 4), ("c", "2024-01-01 10:11:00", 5)], "f2.parquet")
    watermarked_dedup_stream(spark, str(src), **kw)
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(out).collect())
    assert got == [("a", 1), ("b", 3), ("c", 5)]
