"""Snapshot-versioned parquet tables (io/versioned.py): atomic publish,
time travel, rollback, history, retention vacuum."""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark.io.versioned import (
    current_version,
    history,
    read_version,
    rollback,
    vacuum_versions,
    write_version,
)


def _df(spark, n):
    return spark.range(n).selectExpr("id", "id * 2 AS doubled")


def test_write_read_time_travel_rollback(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert current_version(t) is None
    assert write_version(_df(spark, 3), t) == 1
    assert write_version(_df(spark, 5), t) == 2
    assert current_version(t) == 2
    assert read_version(spark, t).count() == 5          # current
    assert read_version(spark, t, version=1).count() == 3  # time travel
    rollback(t, 1)
    assert read_version(spark, t).count() == 3
    # writing after rollback continues PAST the retained snapshots
    assert write_version(_df(spark, 7), t) == 3
    assert read_version(spark, t).count() == 7
    assert read_version(spark, t, version=2).count() == 5  # still readable


def test_history_and_vacuum(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for n in (2, 4, 6, 8):
        write_version(_df(spark, n), t)
    h = history(t)
    assert [x["version"] for x in h] == [1, 2, 3, 4]
    assert h[-1]["is_current"] and all(x["bytes"] > 0 for x in h)
    removed = vacuum_versions(t, keep_last=2)
    assert removed == [1, 2]
    assert [x["version"] for x in history(t)] == [3, 4]
    assert read_version(spark, t).count() == 8
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, version=1)


def test_vacuum_never_removes_current(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for n in (2, 4, 6):
        write_version(_df(spark, n), t)
    rollback(t, 1)
    removed = vacuum_versions(t, keep_last=1)
    # current (1) survives even though only the newest would be kept
    assert 1 not in removed
    assert read_version(spark, t).count() == 2


def test_delete_keys_then_vacuum_destroys_history(spark, tmp_path):
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.io.versioned import delete_keys

    t = str(tmp_path / "tbl")
    write_version(_df(spark, 10), t)
    keys = spark.createDataFrame([(3,), (7,)], "id long")
    v = delete_keys(spark, t, keys, ["id"])
    assert v == 2
    ids = {r["id"] for r in read_version(spark, t).collect()}
    assert ids == set(range(10)) - {3, 7}
    # logical delete keeps history readable until vacuum...
    assert read_version(spark, t, version=1).count() == 10
    # ...and vacuum performs the physical erasure
    vacuum_versions(t, keep_last=1)
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, version=1)
    # the delete plan never shuffles the fact side (broadcast anti join)
    current = read_version(spark, t)
    plan_df = current.join(
        F.broadcast(keys), on=["id"], how="left_anti"
    )
    assert "BroadcastHashJoin" in plan_df._jdf.queryExecution().executedPlan().toString() \
        or "LeftAnti" in plan_df._jdf.queryExecution().executedPlan().toString()


def test_write_version_if_conflict(spark, tmp_path):
    import pytest

    from datagouvfr_data_pipelines_spark.io.versioned import (
        PublishConflict,
        current_version,
        read_version,
        write_version,
        write_version_if,
    )

    t = str(tmp_path / "cas_table")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    v1 = write_version(df1, t)

    # writer A reads at v1; writer B publishes v2 under A's feet
    write_version(spark.createDataFrame([(2, "b")], "id long, v string"), t)
    with pytest.raises(PublishConflict):
        write_version_if(
            spark.createDataFrame([(3, "c")], "id long, v string"), t, v1
        )
    # B's publish survives (no lost update); A's orphan dir is unpublished
    assert current_version(t) == 2
    assert [r["v"] for r in read_version(spark, t).collect()] == ["b"]

    # clean retry from the fresh version succeeds
    n = write_version_if(
        spark.createDataFrame([(3, "c")], "id long, v string"), t, 2
    )
    assert current_version(t) == n


def test_publish_crash_windows_lose_nothing(spark, tmp_path):
    """ATOMICITY.md Pattern B: every write_version failure point leaves the
    previous pointer target readable — a partial v-dir, a complete orphan
    v-dir, and a stale tmp pointer are all tolerated and never reused."""
    import json
    import os

    t = str(tmp_path / "tbl")
    write_version(_df(spark, 3), t)

    # crash during the v=2 data write: partial directory, pointer untouched
    os.makedirs(os.path.join(t, "v=2"))
    with open(os.path.join(t, "v=2", "part-junk.parquet"), "wb") as fh:
        fh.write(b"partial")
    assert current_version(t) == 1
    assert read_version(spark, t).count() == 3  # readers see v=1

    # next publish never reuses the orphaned number
    assert write_version(_df(spark, 5), t) == 3
    assert read_version(spark, t).count() == 5

    # crash before the pointer os.replace: stale tmp pointer lying around
    with open(os.path.join(t, "_CURRENT.__tmp"), "w") as fh:
        json.dump({"version": 99, "published_at": 0}, fh)
    assert current_version(t) == 3  # tmp is invisible to readers
    assert write_version(_df(spark, 7), t) == 4  # and gets overwritten
    assert current_version(t) == 4
    assert read_version(spark, t).count() == 7


def test_rollup_pointer_crash_converges(spark, tmp_path):
    """ATOMICITY.md Pattern B: a refresh that died after writing gen=N but
    before flipping the pointer leaves an orphan generation; the next
    refresh re-derives the same N, overwrites the orphan and publishes —
    readers never see a torn generation."""
    import os
    import shutil

    from datagouvfr_data_pipelines_spark.pipelines.rollup import RollupPyramid

    base = str(tmp_path / "pyr")
    pyr = RollupPyramid(spark, base)
    pyr.add("daily", lambda _: _df(spark, 4))
    pyr.refresh_all()
    assert pyr.current_generation("daily") == 0
    tdir = os.path.join(base, "daily")

    # simulate the crash: gen=1 fully written, pointer still at 0
    shutil.copytree(os.path.join(tdir, "gen=0"), os.path.join(tdir, "gen=1"))
    assert pyr.current_generation("daily") == 0
    assert pyr.read("daily").count() == 4  # readers untouched

    pyr.refresh_all()  # re-derives gen=1, overwrites the orphan, publishes
    assert pyr.current_generation("daily") == 1
    assert pyr.read("daily").count() == 4
