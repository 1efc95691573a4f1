"""Catalog batch 4: right join (cache-reuse shape), post-agg percentages,
derived-key ordered export."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "j3_right_join_cache",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           t.nb_orders
    FROM (SELECT o_custkey, COUNT(*) AS nb_orders FROM orders GROUP BY o_custkey) t
    RIGHT JOIN customer c ON t.o_custkey = c.c_custkey
    """,
    tags=["J3"],
)
def j3_right_join_cache(spark, sf_dir):
    """J3: right join — yesterday's enriched file RIGHT JOIN today's rows
    (schema/irve/geo_utils/geo.py:262-270): keep every right-side row,
    carry cached values where present."""
    totals = table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("nb_orders")
    )
    cust = table(spark, sf_dir, "customer")
    return totals.join(
        cust, totals["o_custkey"] == cust["c_custkey"], "right"
    ).select("c_custkey", "c_name", "nb_orders")


@register(
    "a10_pct_of_total",
    oracle="""
    WITH agg AS (
      SELECT o_orderpriority, COUNT(*) AS nb
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, nb,
           round(CAST(nb AS DOUBLE) * 100 / SUM(nb) OVER (), 6) AS pct
    FROM agg
    """,
    tags=["A10"],
)
def a10_pct_of_total(spark, sf_dir):
    """A10: derived post-aggregation percentage of total
    (generate_kpis_rupture.py:167-177 pct_rupture) — the total via an
    unpartitioned window over the tiny aggregate, not a second scan."""
    agg = table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("nb")
    )
    w = Window.partitionBy()
    return agg.select(
        "o_orderpriority",
        "nb",
        F.round(F.col("nb").cast("double") * 100 / F.sum("nb").over(w), 6).alias("pct"),
    )


@register(
    "scalar_url_params",
    oracle="""
    WITH urls AS (
      SELECT event_id,
             '/api/resources/' || CAST(user_id AS VARCHAR) || '?page=' ||
             CAST(event_id % 7 AS VARCHAR) || '&fmt=json' AS url
      FROM events WHERE event_id < 200
    )
    SELECT event_id,
           string_split(url, '?')[1] AS path,
           regexp_extract(url, 'page=(\\d+)', 1) AS page,
           regexp_extract(url, 'fmt=(\\w+)', 1) AS fmt
    FROM urls
    """,
    tags=["scalar-string", "P3"],
)
def scalar_url_params(spark, sf_dir):
    """§2.8 split/extract: URL query-string parsing — the tabular-metrics
    params extraction (dgv/tabular_metrics/task_functions.py:78-87). The
    str_to_map form exists too; regexp_extract is used here for oracle
    parity (DuckDB's map type doesn't hash-compare)."""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    url = F.concat(
        F.lit("/api/resources/"), F.col("user_id").cast("string"),
        F.lit("?page="), (F.col("event_id") % 7).cast("string"),
        F.lit("&fmt=json"),
    )
    return ev.select(
        "event_id",
        F.split(url, "\\?").getItem(0).alias("path"),
        F.regexp_extract(url, "page=(\\d+)", 1).alias("page"),
        F.regexp_extract(url, "fmt=(\\w+)", 1).alias("fmt"),
    )


@register(
    "scalar_ts_parse",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_s,
           CAST(CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS TIMESTAMP) AS reparsed
    FROM events WHERE event_id < 200
    """,
    tags=["scalar-date"],
)
def scalar_ts_parse(spark, sf_dir):
    """§2.8 date/time: epoch extraction, ISO formatting, round-trip parse
    (metrics/task.py:126 ISO parse; meteo RFC-ish parses)."""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_s"),
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("reparsed"),
    )


@register(
    "o2_derived_key_sort",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    ORDER BY CAST(regexp_extract(CAST(p_partkey AS VARCHAR), '(\\d+)$', 1) AS INTEGER) % 97,
             p_partkey
    LIMIT 25
    """,
    tags=["O2", "O3"],
)
def o2_derived_key_sort(spark, sf_dir):
    """O2/O3: sort by a derived numeric key then limit — the id_mutation
    numeric-suffix sort (dvf/geoloc/task_functions.py:315-318)."""
    part = table(spark, sf_dir, "part")
    key = (
        F.regexp_extract(F.col("p_partkey").cast("string"), r"(\d+)$", 1).cast("int")
        % 97
    )
    return part.orderBy(key.asc(), F.col("p_partkey").asc()).limit(25).select(
        "p_partkey", "p_name"
    )
