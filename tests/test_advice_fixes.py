"""Regression tests for per-round ADVICE findings: stateful timeout
handling, as-of join tiebreaker determinism, the simhash pigeonhole guard,
deterministic GeoJSON feature order, rename-swap crash recovery (round 1);
plan-derived fan_out width, ban_select non-numeric house numbers, the
reordered-flag NULL pin, the batch-index persist lifecycle, and the
O(batch) semantic index commit (round 8)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
import pyspark.sql.functions as F


# ---------------------------------------------------------------- stateful


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the update function."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = None
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms

    def remove(self):
        self.removed = True


def test_session_updater_timeout_removes_state_and_emits_nothing():
    from datagouvfr_data_pipelines_spark.streaming.stateful import make_session_updater

    update = make_session_updater(gap_seconds=60)
    # timeout invocation: state exists, NO data batches (iterator is empty)
    state = _FakeState(value=(3, 1_000_000, 5), timed_out=True)
    out = list(update((42,), iter([]), state))
    assert out == []
    assert state.removed
    assert state.updated is None  # no state write on the timeout path


def test_session_updater_data_path_still_works():
    from datagouvfr_data_pipelines_spark.streaming.stateful import make_session_updater

    update = make_session_updater(gap_seconds=60)
    batch = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:00:00",
                                                "2024-01-01 00:00:30",
                                                "2024-01-01 00:05:00"])})
    state = _FakeState()
    out = pd.concat(list(update((42,), iter([batch]), state)))
    # 30s gap keeps session 1; the 4.5 min gap opens session 2
    assert sorted(out["session_id"].tolist()) == [1, 2]
    assert state.updated is not None and not state.removed


# ---------------------------------------------------------------- as-of join


def test_asof_join_tiebreaker_is_deterministic(spark):
    from datagouvfr_data_pipelines_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame([(1, 100)], "k int, t int")
    # two right rows at the SAME (key, ts) with different payloads
    right = spark.createDataFrame(
        [(1, 50, "low"), (1, 50, "zzz-high")], "k int, t int, v string"
    )
    out = asof_join_backward(
        left, right, "k", "t", "t", ["v"], right_tiebreaker="v"
    ).collect()
    # ascending tiebreaker + last() => the greatest v wins, independent of
    # input partitioning
    assert out[0]["v"] == "zzz-high"

    shuffled = asof_join_backward(
        left, right.repartition(7), "k", "t", "t", ["v"], right_tiebreaker="v"
    ).collect()
    assert shuffled[0]["v"] == "zzz-high"


def test_asof_join_tiebreaker_must_be_selected(spark):
    from datagouvfr_data_pipelines_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame([(1, 100)], "k int, t int")
    right = spark.createDataFrame([(1, 50, "x")], "k int, t int, v string")
    with pytest.raises(ValueError, match="right_tiebreaker"):
        asof_join_backward(left, right, "k", "t", "t", ["v"], right_tiebreaker="w")


# ---------------------------------------------------------------- simhash


def test_simhash_guard_rejects_unsound_band_count(spark, sf_dir):
    from datagouvfr_data_pipelines_spark.operators.dedup import simhash_neardup_pairs
    from datagouvfr_data_pipelines_spark.plans.catalog import table

    docs = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="divide"):
        simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=4, bands=6)
    # bands=None auto-sizes to a sound divisor of 64 — plan builds fine
    simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=8).schema
    # ... including the top of the range (needs 64 bands, not StopIteration)
    simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=32).schema


# ---------------------------------------------------------------- geojson


def test_geojson_feature_order_deterministic(spark):
    from datagouvfr_data_pipelines_spark.io.writers import geojson_feature_collection

    rows = [(float(i % 7), float(i % 5), f"n{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "lon double, lat double, name string")
    a = geojson_feature_collection(df.repartition(8), "lon", "lat", ["name"])
    b = geojson_feature_collection(df.repartition(3), "lon", "lat", ["name"])
    assert a == b
    assert a.startswith('{"type": "FeatureCollection"')


# ---------------------------------------------------------------- swap repair


def test_recover_swap_state_rolls_forward_and_cleans(tmp_path, spark):
    from datagouvfr_data_pipelines_spark.io.writers import (
        _recover_swap_state,
        merge_upsert_accumulate,
    )

    sink = str(tmp_path / "sink")
    df = spark.createDataFrame([(1, 10)], "k int, n int")

    # crash between the two renames: data only under __old
    df.write.parquet(sink + "__old")
    os.makedirs(sink + "__tmp_swap", exist_ok=True)  # plus a stale tmp
    _recover_swap_state(sink)
    assert os.path.exists(sink) and not os.path.exists(sink + "__old")
    assert not os.path.exists(sink + "__tmp_swap")
    assert spark.read.parquet(sink).collect()[0]["n"] == 10

    # a normal upsert after recovery accumulates correctly
    merge_upsert_accumulate(
        spark, spark.createDataFrame([(1, 5)], "k int, n int"), sink, ["k"], ["n"]
    )
    assert spark.read.parquet(sink).collect()[0]["n"] == 15

    # stale __old WITH a live sink is dropped, sink untouched
    df.write.parquet(sink + "__old")
    _recover_swap_state(sink)
    assert not os.path.exists(sink + "__old")
    assert spark.read.parquet(sink).collect()[0]["n"] == 15


def test_ewma_alerter_scores_against_pre_update_baseline():
    from datagouvfr_data_pipelines_spark.streaming.stateful import make_ewma_alerter

    update = make_ewma_alerter(alpha=0.2, z_threshold=3.0, warmup=5)
    ts = pd.to_datetime([f"2024-01-01 00:00:{s:02d}" for s in range(20)])
    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 10.0, 10.3, 9.7,
            50.0,  # the spike
            10.0, 10.1, 9.9, 10.2, 9.8, 10.0, 10.1, 9.9, 10.0]
    batch = pd.DataFrame({"ts": ts, "value": vals})
    state = _FakeState()
    out = pd.concat(list(update(("m1",), iter([batch]), state)))
    assert list(out["value"]) == [50.0]
    assert out["z"].iloc[0] > 3.0
    assert abs(out["baseline"].iloc[0] - 10.0) < 1.0  # spike didn't drag it
    assert state.updated is not None and state.updated[2] == 20

    # timeout path reaps state
    s2 = _FakeState(value=(10.0, 1.0, 5), timed_out=True)
    assert list(update(("m1",), iter([]), s2)) == []
    assert s2.removed


def test_ewma_alert_stream_end_to_end(spark, tmp_path):
    import glob as globmod
    import shutil

    from datagouvfr_data_pipelines_spark.streaming.stateful import ewma_alert_stream

    src = tmp_path / "esrc"
    src.mkdir()
    rows = []
    base = 100.0
    for i in range(30):
        rows.append(("sensor", f"2024-01-01 00:00:{i:02d}", base + (i % 3) * 0.5))
    rows[25] = ("sensor", "2024-01-01 00:00:25", 500.0)
    stage = str(tmp_path / "estage")
    (
        spark.createDataFrame(rows, "key string, ts string, value double")
        .selectExpr("key", "cast(ts as timestamp) ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(stage)
    )
    shutil.move(globmod.glob(stage + "/part-*.parquet")[0], str(src / "f1.parquet"))

    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .parquet(str(src))
    )
    out_dir = str(tmp_path / "eout")
    q = (
        ewma_alert_stream(stream, alpha=0.2, z_threshold=3.0, warmup=5)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps availableNow alive running timeout-check
    # batches until the (1 h) timeouts fire, so a bare awaitTermination()
    # would block ~forever on a drained source. Poll for the alert row,
    # then stop the query explicitly.
    import time as timemod

    deadline = timemod.time() + 120
    while timemod.time() < deadline:
        if q.awaitTermination(2):
            break
        try:
            if spark.read.parquet(out_dir).count() > 0:
                break
        except Exception:
            pass  # sink dir not created yet
    q.stop()
    alerts = spark.read.parquet(out_dir).collect()
    assert [r["value"] for r in alerts] == [500.0]


# ------------------------------------------------- round-8 advice findings


def test_fan_out_shuffle_derived_frame_not_judged_wide(spark):
    """Round-8 advice (medium): a shuffle-derived frame whose static plan
    claims 32 pre-coalesce partitions — but which AQE would collapse to ~1
    for its few bytes — must be FANNED, not skipped; and the probe must not
    go through df.rdd (which would materialize the upstream shuffle stage
    and run the aggregation twice)."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    par = spark.sparkContext.defaultParallelism
    base = spark.range(1000).withColumn("k", F.col("id") % 7)
    agg = base.groupBy("k").agg(F.count(F.lit(1)).alias("n"))  # tiny output
    out = fan_out(agg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan, plan[:1500]
    assert out.count() == 7
    assert out.rdd.getNumPartitions() == par


def test_fan_out_explicit_repartition_respected(spark):
    """An explicit repartition(N >= parallelism) pins the width (exempt
    from AQE coalescing) — fan_out must be the identity there, and must
    fan a coalesce(1) frame, both WITHOUT touching df.rdd first."""
    from datagouvfr_data_pipelines_spark.session import _plan_width, fan_out

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(100).repartition(par + 3)
    assert _plan_width(wide) == par + 3
    assert fan_out(wide) is wide
    narrow = spark.range(100).coalesce(1)
    assert _plan_width(narrow) == 1
    assert fan_out(narrow).rdd.getNumPartitions() == par


def test_ban_select_non_numeric_numvoie_does_not_raise():
    """Round-8 advice: '12B' style house numbers cannot interpolate; the
    reference crashes row-at-a-time, but inside an Arrow batch a raise
    would fail the whole geocode job — fall through to the fallbacks."""
    from datagouvfr_data_pipelines_spark.functions.udfs import ban_select

    calls = []

    def service(q, citycode):
        calls.append(q)
        return None  # BAN miss forces the interpolation branch

    out = ban_select("12B", "RUE", "DE LA PAIX", "75101", service)
    assert out == (None, None, None, None, None)
    # no n-2/n+2 interpolation queries were attempted for a non-numeric
    assert calls == ["12B RUE DE LA PAIX"]

    def street_service(q, citycode):
        return {"lon": 2.0, "lat": 48.0, "score": 0.9, "type": "street"}

    lon, lat, score, typ, _ = ban_select(
        "3bis", "RUE", "DE LA PAIX", "75101", street_service
    )
    assert typ == "street" and score == 0.9


def test_fix_reversed_coords_flag_never_null(spark):
    """Round-8 advice: NULL lon/lat must yield reordered=False (the
    reference's flag column is always a concrete boolean), not NULL."""
    from datagouvfr_data_pipelines_spark.functions.geo import fix_reversed_coords

    df = spark.createDataFrame(
        [(2.35, 48.85), (None, 48.85), (None, None), (48.85, 2.35)],
        "lon double, lat double",
    )
    out = fix_reversed_coords(df, "lon", "lat", reordered_col="reordered")
    flags = [r["reordered"] for r in out.collect()]
    assert flags == [False, False, False, True]


def test_incremental_semantic_persist_lifecycle(spark):
    """Round-8 advice: the batch index persist must not leak — persist=False
    caches nothing; the default caches exactly one frame which unpersist()
    releases."""
    from datagouvfr_data_pipelines_spark.operators.incremental_semantic import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    jsc = spark.sparkContext._jsc.sc()
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    batch = spark.createDataFrame(
        [(10, [0.99, 0.01])], "vec_id long, embedding array<float>"
    )
    idx = build_semantic_index(corpus, "vec_id", "embedding", cents)
    before = jsc.getPersistentRDDs().size()

    res = incremental_semantic_dedup(
        batch, idx, "vec_id", "embedding", cents, threshold=0.9, persist=False
    )
    assert res.cached is None
    res.ledger.collect()
    assert jsc.getPersistentRDDs().size() == before, "persist=False leaked a cache"

    res = incremental_semantic_dedup(
        batch, idx, "vec_id", "embedding", cents, threshold=0.9
    )
    res.ledger.collect()
    assert jsc.getPersistentRDDs().size() == before + 1
    res.unpersist()
    assert jsc.getPersistentRDDs().size() == before


def test_semantic_index_commit_is_per_batch(spark, tmp_path):
    """Round-8 advice: the semantic index commit must be O(batch) — each
    drain adds ONE batch=<id> subdir and never rewrites earlier batches'
    files (mtimes unchanged across a later drain)."""
    import glob as globmod
    import shutil

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
        schema="vec_id long, embedding array<float>",
        id_col="vec_id",
        vec_col="embedding",
        centroids=[[1.0, 0.0], [-1.0, 0.0]],
        corpus_dir=str(tmp_path / "corpus"),
        index_dir=index_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.9,
    )
    mk = lambda rows: spark.createDataFrame(rows, kw["schema"])  # noqa: E731
    land(mk([(1, [1.0, 0.0])]), "f1.parquet")
    semantic_ingest_stream(spark, str(src), **kw)
    b0_files = sorted(globmod.glob(os.path.join(index_dir, "batch=0", "*.parquet")))
    assert b0_files, "first drain must commit batch=0"
    mtimes = {p: os.path.getmtime(p) for p in b0_files}

    land(mk([(11, [0.0, 1.0])]), "f2.parquet")
    semantic_ingest_stream(spark, str(src), **kw)
    assert os.path.isdir(os.path.join(index_dir, "batch=1"))
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, "earlier batch rewritten: commit is O(corpus)"
    docs = sorted(r["doc"] for r in spark.read.parquet(index_dir).collect())
    assert docs == [1, 11]


def test_legacy_root_files_plus_torn_batch_dir_is_readable(spark, tmp_path):
    """Round-9 advice (high): when round-7 legacy root-level parquet files
    coexist with batch=<id> dirs, the committed-path list must name the
    legacy FILES, never index_dir itself — a root read discovers a torn
    batch dir (id > watermark, the documented rename-to-watermark crash
    window) at partition depth 1 while root files sit at depth 0, and
    spark.read.parquet dies with CONFLICTING_DIRECTORY_STRUCTURES on every
    restart, wedging the stream before recovery runs."""
    import glob as globmod
    import shutil

    from datagouvfr_data_pipelines_spark.streaming.semantic_stream import (
        _committed_index_paths,
        semantic_ingest_stream,
    )

    index_dir = str(tmp_path / "index")
    schema = "doc long, cell int, vec array<float>, nrm double, c_sim double"
    legacy = spark.createDataFrame([(1, 0, [1.0, 0.0], 1.0, 1.0)], schema)
    torn = spark.createDataFrame([(99, 1, [0.0, 1.0], 1.0, 1.0)], schema)

    def land_parts(df, dest):
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(dest, exist_ok=True)
        for p in globmod.glob(stage + "/part-*.parquet"):
            shutil.move(p, os.path.join(dest, os.path.basename(p)))

    land_parts(legacy, index_dir)  # legacy round-7 layout: bare root files
    # torn commit: batch dir renamed into place but watermark never advanced
    land_parts(torn, os.path.join(index_dir, "batch=3"))

    paths = _committed_index_paths(index_dir, watermark=-1)
    assert index_dir not in paths, "index root passed as a read root"
    assert all(p.endswith(".parquet") for p in paths)
    docs = [r["doc"] for r in spark.read.parquet(*paths).collect()]
    assert docs == [1], "torn batch visible or legacy rows lost"

    # end-to-end: a drain over this wedged layout must not raise, must see
    # only the legacy index (doc 1), and must repair the torn dir's id when
    # its own batch reuses it
    src = tmp_path / "src"
    src.mkdir()
    batch = spark.createDataFrame(
        [(50, [1.0, 0.0]), (51, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    stage = str(tmp_path / "stage2")
    batch.coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.move(globmod.glob(stage + "/part-*.parquet")[0], str(src / "f1.parquet"))
    semantic_ingest_stream(
        spark,
        str(src),
        schema="vec_id long, embedding array<float>",
        id_col="vec_id",
        vec_col="embedding",
        centroids=[[1.0, 0.0], [-1.0, 0.0]],
        corpus_dir=str(tmp_path / "corpus"),
        index_dir=index_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.9,
    )
    # doc 50 is a near-dup of legacy doc 1 (same direction) -> dropped;
    # doc 51 survives; torn doc 99 must NOT have suppressed anything
    survivors = [
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    ]
    assert survivors == [51]
