"""Unit coverage for operator-library functions not exercised by the
oracle catalog: change detection, membership split, CDC heuristics, null
policy, top-k, conditional counts on empty frames."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datagouvfr_data_pipelines_spark.operators.aggregates import (
    conditional_count_agg,
    top_k_by,
)
from datagouvfr_data_pipelines_spark.operators.cleaning import null_policy
from datagouvfr_data_pipelines_spark.operators.setops import (
    apply_cdc_full_replace_heuristic,
    cdc_diff,
    membership_split,
)
from datagouvfr_data_pipelines_spark.operators.windows import (
    change_detection_ids,
    keep_best_row,
)


def test_change_detection_ids(spark):
    """W1 mutation-id shape: new group when (date, price) changes after sort
    (dvf/geoloc:257-268)."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01", 100.0),
            (2, "2024-01-01", 100.0),   # same sale -> same id
            (3, "2024-01-01", 250.0),   # price changed -> new id
            (4, "2024-02-01", 250.0),   # date changed -> new id
        ],
        "row_id int, d string, prix double",
    )
    out = change_detection_ids(
        df, [F.col("d").asc(), F.col("prix").asc(), F.col("row_id").asc()],
        ["d", "prix"],
    )
    ids = {r["row_id"]: r["group_id"] for r in out.collect()}
    assert ids[1] == ids[2]
    assert len({ids[1], ids[3], ids[4]}) == 3


def test_membership_split(spark):
    cands = spark.createDataFrame([("f1",), ("f2",), ("f3",)], "name string")
    ledger = spark.createDataFrame([("f2",)], "name string")
    todo, done = membership_split(cands, ledger, ["name"])
    assert sorted(r["name"] for r in todo.collect()) == ["f1", "f3"]
    assert [r["name"] for r in done.collect()] == ["f2"]


def test_cdc_full_replace_heuristic(spark):
    old = spark.createDataFrame([(i,) for i in range(30)], "k int")
    new = spark.createDataFrame([(i,) for i in range(25, 40)], "k int")
    diff = cdc_diff(new, old)
    assert apply_cdc_full_replace_heuristic(diff, full_replace_threshold=10) == "full_replace"
    assert apply_cdc_full_replace_heuristic(diff, full_replace_threshold=100) == "merge"


def test_null_policy(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (float("inf"), "b"), (None, None)], "v double, s string"
    )
    out = null_policy(df, inf_to_null=["v"], fills={"s": "?"})
    rows = {(r["v"], r["s"]) for r in out.collect()}
    assert rows == {(1.0, "a"), (None, "b"), (None, "?")}
    dropped = null_policy(df, inf_to_null=["v"], drop_subset=["v"])
    assert dropped.count() == 1


def test_top_k_by(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(10)], "v int, g int")
    top = top_k_by(df, "v", 3)
    assert sorted(r["v"] for r in top.collect()) == [7, 8, 9]
    bottom = top_k_by(df, "v", 2, ascending=True)
    assert sorted(r["v"] for r in bottom.collect()) == [0, 1]


def test_conditional_count_agg_empty_input(spark):
    df = spark.createDataFrame([], "d string, seg string")
    out = conditional_count_agg(df, ["d"], {"nb_x": F.col("seg") == "x"})
    assert out.count() == 0
    assert set(out.columns) == {"d", "nb_x", "nb_total"}


def test_keep_best_row_deterministic_under_repartition(spark):
    """The determinism property that bans dropDuplicates-after-sort: the
    window form returns the same survivor regardless of partitioning."""
    rows = [("k", i, f"v{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "k string, pri int, payload string")
    expected = [("k", 49, "v49")]
    for nparts in (1, 7, 32):
        out = keep_best_row(
            df.repartition(nparts), ["k"], [F.col("pri").desc()]
        ).collect()
        assert [(r["k"], r["pri"], r["payload"]) for r in out] == expected


def test_ordered_cdc_apply(spark, tmp_path):
    from datagouvfr_data_pipelines_spark.operators.setops import ordered_cdc_apply

    sink = str(tmp_path / "state")
    snap1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    snap2 = spark.createDataFrame([("a", 1), ("b", 20), ("c", 3)], "k string, v int")
    decisions = ordered_cdc_apply(spark, [("s1", snap1), ("s2", snap2)], sink)
    assert decisions == ["s1:initial_load", "s2:merge"]
    state = {(r["k"], r["v"]) for r in spark.read.parquet(sink).collect()}
    assert state == {("a", 1), ("b", 20), ("c", 3)}

    # huge deletion count triggers full replace
    snap3 = spark.createDataFrame([("z", 9)], "k string, v int")
    decisions2 = ordered_cdc_apply(
        spark, [("s3", snap3)], sink, full_replace_threshold=1
    )
    assert decisions2 == ["s3:full_replace"]
    assert {tuple(r) for r in spark.read.parquet(sink).collect()} == {("z", 9)}


def test_ordered_cdc_apply_recovers_torn_swap(spark, tmp_path):
    """ATOMICITY.md Pattern A: a crash between the two swap renames leaves
    the CDC sink only under __old; the next apply must roll it forward and
    converge — not treat the sink as empty (which would turn a merge into
    an initial_load and silently drop rows absent from the new snapshot)."""
    import os
    import shutil

    from datagouvfr_data_pipelines_spark.operators.setops import ordered_cdc_apply

    sink = str(tmp_path / "state")
    snap1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    ordered_cdc_apply(spark, [("s1", snap1)], sink)

    # torn layout: rename #1 done, rename #2 never ran, stale tmp behind
    os.rename(sink, sink + "__old")
    os.makedirs(sink + "__tmp")
    with open(os.path.join(sink + "__tmp", "junk"), "w") as fh:
        fh.write("stale")

    snap2 = spark.createDataFrame([("a", 1), ("b", 20), ("c", 3)], "k string, v int")
    decisions = ordered_cdc_apply(spark, [("s2", snap2)], sink)
    # recovered sink means MERGE against the restored state, not initial_load
    assert decisions == ["s2:merge"]
    state = {(r["k"], r["v"]) for r in spark.read.parquet(sink).collect()}
    assert state == {("a", 1), ("b", 20), ("c", 3)}
    assert not os.path.exists(sink + "__old")
    assert not os.path.exists(sink + "__tmp")
    shutil.rmtree(sink)


def test_winsorize_clips_to_group_quantiles(spark):
    import pytest as _pytest

    from datagouvfr_data_pipelines_spark.operators.aggregates import winsorize

    rows = [("g1", float(v)) for v in range(1, 11)] + [("g1", 1000.0), ("g2", 5.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {
        (r.g, r.x): r.x_w for r in winsorize(df, "x", ["g"], 0.0, 0.5).collect()
    }
    # g1 median of [1..10, 1000] = 6.0 -> everything above clips to 6
    assert out[("g1", 1000.0)] == 6.0
    assert out[("g1", 10.0)] == 6.0
    assert out[("g1", 1.0)] == 1.0   # lower=0.0 -> min, nothing clips below
    assert out[("g2", 5.0)] == 5.0   # single-row group: p0 == p50 == value
    with _pytest.raises(ValueError, match="lower"):
        winsorize(df, "x", ["g"], 0.9, 0.1)


def test_record_field_diff_matches_diffmanager_semantics(spark):
    """Reference parity (verticales/simplifions/diff_manager.py): equal
    records diff to nothing; a changed field surfaces old+new; changes to
    ignored volatile keys alone produce NO rows (the reference's None)."""
    from datagouvfr_data_pipelines_spark.operators.setops import (
        record_field_diff,
    )

    old = spark.createDataFrame(
        [
            (1, "value", "value2", 1729000000, "testman"),
            (2, "keep", "same", 1729000000, "testman"),
            (3, None, "x", 1729000000, "testman"),
        ],
        "id long, key string, key2 string, modified_at long, modified_by string",
    )
    new = spark.createDataFrame(
        [
            (1, "different value", "value2", 1729000001, "Monique"),
            (2, "keep", "same", 1729000099, "Robot"),   # ignored-only churn
            (3, "x", "x", 1729000000, "testman"),       # NULL -> value change
        ],
        "id long, key string, key2 string, modified_at long, modified_by string",
    )
    got = {
        (r.id, r.column): (r.old_value, r.new_value)
        for r in record_field_diff(
            old, new, ["id"], ignore_cols=["modified_at", "modified_by"]
        ).collect()
    }
    assert got == {
        (1, "key"): ("value", "different value"),
        (3, "key"): (None, "x"),
    }
    # record 2 changed ONLY ignored keys -> absent entirely
    assert not any(k[0] == 2 for k in got)
