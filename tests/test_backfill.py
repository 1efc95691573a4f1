"""Backfill orchestration (orchestration/backfill.py): partition-ledger
idempotency, gap-only execution, force reprocessing."""

from __future__ import annotations

import datetime as dt

from datagouvfr_data_pipelines_spark.orchestration.backfill import (
    backfill_dates,
    date_range,
    missing_dates,
)


def test_backfill_runs_only_gaps_and_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "daily")
    calls = []

    def day_job(sp, d):
        calls.append(d)
        return sp.createDataFrame([(d.day, "x")], "v int, k string")

    dates = date_range(dt.date(2024, 1, 1), dt.date(2024, 1, 4))
    done = backfill_dates(spark, out, "day", dates, day_job)
    assert done == dates and calls == dates

    # second run: ledger says everything's done -> zero work
    calls.clear()
    assert backfill_dates(spark, out, "day", dates, day_job) == []
    assert calls == []

    # a late-arriving gap (delete one partition) is the only rerun
    import shutil

    shutil.rmtree(f"{out}/day=2024-01-03")
    assert missing_dates(out, "day", dates) == [dt.date(2024, 1, 3)]
    assert backfill_dates(spark, out, "day", dates, day_job) == [dt.date(2024, 1, 3)]

    # force reprocesses the full window without duplicating rows
    backfill_dates(spark, out, "day", dates, day_job, force=True)
    df = spark.read.parquet(out)
    assert df.count() == 4
    assert df.where("day = '2024-01-02'").count() == 1
