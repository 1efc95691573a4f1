"""PySpark-native analytics engine with the query and data-processing
capabilities of datagouv/datagouvfr_data_pipelines, re-expressed Spark-first.

Layout
------
- ``session``   : SparkSession factory (AQE, shuffle partitions, UTC, zstd).
- ``io``        : typed readers (csv/fixed-width/text/json/parquet) + writers.
- ``operators`` : composable DataFrame -> DataFrame operator library
                  (cleaning, joins, aggregates, windows, dedup, cdc, setops).
- ``functions`` : scalar/column function library (text, dates, similarity).
- ``plans``     : the query catalog — every SURVEY §2 operator as a named
                  (spark_fn, oracle_sql) pair consumed by ``__spark_entry__``.
- ``streaming`` : Trigger.AvailableNow veneer over the batch operators.
"""

__version__ = "0.1.0"
