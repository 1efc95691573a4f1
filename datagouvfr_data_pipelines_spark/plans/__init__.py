"""Query catalog: every SURVEY §2 operator as a named (spark_fn, oracle_sql) pair."""

from datagouvfr_data_pipelines_spark.plans.catalog import CATALOG, oracle_sql, queries

__all__ = ["CATALOG", "queries", "oracle_sql"]
