"""Bucketed tables for shuffle-free co-located joins (SURVEY §4 "Indexes"
replacement; the 100 TB answer to repeatedly joining the same big tables).

A fact table bucketed on its join key joins another table bucketed the same
way with ZERO exchange — the shuffle is paid once at write time instead of
per query. This is the Spark equivalent of the reference's btree indexes on
join keys (index_dvf_table.sql:1-4): a physical layout decision that makes
every downstream join cheap.

Bucketed writes require the session catalog (``saveAsTable``); plain
``parquet(path)`` cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables — with matching bucket spec on the join
    keys, the plan contains no Exchange (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
