"""Date-range backfill with partition-ledger idempotency.

The reference reprocesses history by deleting a date's rows and
re-inserting them (dgv/metrics remove_visit_metrics.sql + forced-rebuild
DAG params, utils/tasks.py:9-42). Spark-first, the OUTPUT PARTITION
DIRECTORY is the ledger: a date is done iff its ``<date_col>=<date>``
partition exists with a ``_SUCCESS``-committed write, so a backfill run
simply diffs the requested range against the directory listing and runs
only the gaps. Re-running after a crash is safe — each day job writes
through ``overwrite_date_partition`` (dynamic partition overwrite), so a
half-finished day is replaced wholesale, never appended twice.

At scale this is how a 1000-day catch-up actually ships: days are
independent (launch N in parallel from the scheduler), the ledger is the
storage itself (no external state to drift), and ``force`` reprocesses a
window without touching the rest.
"""

from __future__ import annotations

import datetime as dt
import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from datagouvfr_data_pipelines_spark.io.writers import overwrite_date_partition


def missing_dates(
    out_dir: str, date_col: str, dates: Iterable[dt.date]
) -> list[dt.date]:
    """Requested dates with no committed output partition yet."""
    todo = []
    for d in dates:
        part = os.path.join(out_dir, f"{date_col}={d.isoformat()}")
        if not os.path.isdir(part):
            todo.append(d)
    return sorted(todo)


def date_range(start: dt.date, end: dt.date) -> list[dt.date]:
    """Inclusive daily range."""
    return [start + dt.timedelta(days=i) for i in range((end - start).days + 1)]


def backfill_dates(
    spark: SparkSession,
    out_dir: str,
    date_col: str,
    dates: Iterable[dt.date],
    day_job: Callable[[SparkSession, dt.date], DataFrame],
    force: bool = False,
) -> list[dt.date]:
    """Run ``day_job`` for every missing (or, with ``force``, every
    requested) date and publish each day with idempotent dynamic
    partition overwrite. Returns the dates actually processed.

    ``day_job(spark, date)`` must return a DataFrame WITHOUT the date
    column; it is stamped here so the partition layout is uniform.
    """
    import pyspark.sql.functions as F

    dates = list(dates)
    todo = dates if force else missing_dates(out_dir, date_col, dates)
    for d in todo:
        df = day_job(spark, d).withColumn(
            date_col, F.lit(d.isoformat())
        )
        overwrite_date_partition(df, out_dir, date_col)
    return list(todo)
