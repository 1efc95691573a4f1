"""Streaming veneer: AvailableNow drain + ledger semantics (ST1/ST2/ST5)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.io.writers import overwrite_date_partition
from datagouvfr_data_pipelines_spark.streaming.availablenow import (
    process_available_files,
    tumbling_window_counts,
)


def test_availablenow_drain_and_ledger(spark, tmp_path):
    import glob as globmod
    import shutil

    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def land(df, name):
        """Write a single parquet FILE into src (the file stream source
        lists flat files; a df.write.parquet() directory would be invisible)."""
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    land(
        spark.createDataFrame([("2024-01-01", "a", 1)], "d string, k string, v int"),
        "f1.parquet",
    )

    seen_batches = []

    def sink_fn(batch_df, batch_id):
        seen_batches.append(batch_id)
        overwrite_date_partition(batch_df, sink, "d")

    def transform(df):
        return df.groupBy("d", "k").agg(F.sum("v").alias("v"))

    schema = "d string, k string, v int"
    process_available_files(
        spark, str(src), schema, transform, sink_fn, ckpt, fmt="parquet"
    )
    assert len(seen_batches) == 1
    out1 = {(str(r["d"]), r["k"]): r["v"] for r in spark.read.parquet(sink).collect()}
    assert out1 == {("2024-01-01", "a"): 1}

    # second run, no new files: the checkpoint ledger yields zero batches
    n_before = len(seen_batches)
    process_available_files(
        spark, str(src), schema, transform, sink_fn, ckpt, fmt="parquet"
    )
    new_rows_batches = len(seen_batches) - n_before
    assert new_rows_batches <= 1  # availableNow may emit one empty batch
    out_same = {(str(r["d"]), r["k"]): r["v"] for r in spark.read.parquet(sink).collect()}
    assert out_same == out1

    # new file arrives: only it is processed; same date is overwritten
    # idempotently (ST2)
    land(
        spark.createDataFrame([("2024-01-01", "a", 5)], "d string, k string, v int"),
        "f2.parquet",
    )
    process_available_files(
        spark, str(src), schema, transform, sink_fn, ckpt, fmt="parquet"
    )
    out2 = {(str(r["d"]), r["k"]): r["v"] for r in spark.read.parquet(sink).collect()}
    # the new batch contains only f2's rows (5), replacing the date partition
    assert out2 == {("2024-01-01", "a"): 5}


def test_tumbling_window_counts(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 23:59:00",), ("2024-01-02 00:01:00",)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    out = tumbling_window_counts(df, "ts", "1 day")
    rows = {str(r["window_start"]): r["nb"] for r in out.collect()}
    assert rows == {"2024-01-01 00:00:00": 2, "2024-01-02 00:00:00": 1}
