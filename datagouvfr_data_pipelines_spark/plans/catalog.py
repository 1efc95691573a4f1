"""Registry backing ``__spark_entry__.py``.

Each catalog entry is a named query: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The
driver hash-compares both at sf0.01 — column names are aliased identically on
both sides, aggregate determinism follows the decimal-sum policy in
``operators/aggregates.py``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: list[str] = field(default_factory=list)


CATALOG: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: list[str] | None = None):
    def deco(fn):
        CATALOG[name] = QueryDef(fn=fn, oracle=oracle, tags=tags or [])
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table; normalizes TIMESTAMP(NANOS) columns.

    The driver's synthetic ``events`` table is written with parquet
    nanosecond timestamps (pandas default), which vanilla Spark rejects
    (PARQUET_TYPE_ILLEGAL). We read nanos as long and rebuild a proper
    TimestampType column — values carry only microsecond precision, so
    ``div 1000`` is lossless and matches DuckDB's TIMESTAMP_NS -> TIMESTAMP
    coercion exactly.
    """
    # timestamps must collect in UTC to line up with DuckDB's naive
    # timestamps regardless of the caller session's timezone config
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet written without isAdjustedToUTC reads as TIMESTAMP_NTZ under
    # Spark 4's inferTimestampNTZ default. Normalize to TIMESTAMP so the
    # instant-based function surface (unix_micros, to_utc_timestamp, window)
    # resolves; with the session tz pinned UTC the cast preserves wall time,
    # which is exactly DuckDB's naive-timestamp view of the same file.
    ntz = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, TimestampNTZType)
    ]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    # NB: no blanket fan_out here — for scan->agg shapes the map-side
    # partial aggregate wants to run INSIDE the scan stage (repartitioning
    # raw rows first is strictly more bytes moved). Operators whose
    # pre-shuffle stage amplifies compute (n-gram building, bigram
    # explode) call session.fan_out themselves, where the trade is right.
    return df


def _load_all() -> None:
    # import for registration side effects
    from datagouvfr_data_pipelines_spark.plans import relational  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational2  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational3  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational4  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational5  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational6  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational7  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational8  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational9  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational10  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational11  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational12  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational13  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational14  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational15  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational16  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational17  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import relational18  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import text_pipeline  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import text_pipeline2  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import text_pipeline3  # noqa: F401
    from datagouvfr_data_pipelines_spark.plans import dataset_assembly  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}
