"""Catalog batch 5: the consolidation engine under the oracle gate, and a
partition-pruned range join."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.pipelines.consolidation import (
    SchemaVersion,
    conform_file,
    consolidate,
)
from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "m4_consolidation",
    oracle="""
    WITH f1 AS (
      SELECT doc_id, lang, source, CAST(NULL AS BIGINT) AS n_chars,
             'res-1' AS resource_id, '2024-01-01' AS last_modified
      FROM documents
    ), f2 AS (
      SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, source, n_chars,
             'res-2' AS resource_id, '2024-06-01' AS last_modified
      FROM documents WHERE doc_id < 250
    ), unioned AS (
      SELECT * FROM f1 UNION ALL SELECT * FROM f2
    )
    SELECT doc_id, lang, source, n_chars, resource_id, last_modified
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY last_modified DESC, resource_id) AS rn
          FROM unioned WHERE doc_id IS NOT NULL)
    WHERE rn = 1
    """,
    tags=["M4", "U1", "P10", "O5"],
)
def m4_consolidation(spark, sf_dir):
    """§3.3 consolidation engine end-to-end under the oracle gate: two
    'resource files' with differing schemas (one missing n_chars, one
    missing lang) are conformed, unioned, gated on the required key and
    deduped keeping the most recently modified row per primaryKey."""
    docs = table(spark, sf_dir, "documents")
    schema = SchemaVersion(
        columns=["doc_id", "lang", "source", "n_chars"],
        types={"n_chars": "bigint"},
        required=["doc_id"],
        primary_key=["doc_id"],
        min_files=2,
    )
    f1 = docs.select("doc_id", "lang", "source")
    f2 = docs.where(F.col("doc_id") < 250).select("doc_id", "source", "n_chars")
    c1 = conform_file(f1, schema, "res-1", "2024-01-01")
    c2 = conform_file(f2, schema, "res-2", "2024-06-01")
    return consolidate([c1, c2], schema)


@register(
    "m3_rollup_chain",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, user_id, COUNT(*) AS nb_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS nb_purchase
      FROM events GROUP BY 1, 2
    ), monthly AS (
      SELECT strftime(date_trunc('month', d), '%Y-%m') AS month, user_id,
             CAST(SUM(nb_events) AS BIGINT) AS nb_events,
             CAST(SUM(nb_purchase) AS BIGINT) AS nb_purchase
      FROM daily GROUP BY 1, 2
    )
    SELECT m.month, m.user_id, m.nb_events, m.nb_purchase,
           t.total_events
    FROM monthly m
    JOIN (SELECT user_id, CAST(SUM(nb_events) AS BIGINT) AS total_events
          FROM monthly GROUP BY user_id) t
    ON m.user_id = t.user_id
    """,
    tags=["M3", "A16", "J5", "A4"],
)
def m3_rollup_chain(spark, sf_dir):
    """§3.1 step 7: the materialized-view pyramid as ONE lineage — daily
    grain -> monthly rollup -> per-id totals joined back
    (dgv/metrics/sql/create_tables.sql:127-342). In production each level
    materializes via RollupPyramid (atomic swap); here the chain runs fused
    so Catalyst reuses the shuffle across levels."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("d"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("nb_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "nb_purchase"
        ),
    )
    monthly = daily.groupBy(
        F.date_format(F.date_trunc("month", F.col("d")), "yyyy-MM").alias("month"),
        "user_id",
    ).agg(
        F.sum("nb_events").alias("nb_events"),
        F.sum("nb_purchase").alias("nb_purchase"),
    )
    totals = monthly.groupBy("user_id").agg(F.sum("nb_events").alias("total_events"))
    return monthly.join(totals, "user_id").select(
        "month", "user_id", "nb_events", "nb_purchase", "total_events"
    )


@register(
    "j9_pruned_range_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
           l.l_extendedprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey >= 500 AND l.l_orderkey < 1500
    """,
    tags=["J9"],
)
def j9_pruned_range_join(spark, sf_dir):
    """J9: range-restricted equi-join — the reference's manual id-prefix
    batched join (dvf/geoloc/task_functions.py:111-154) as ONE join with
    the range predicate pushed to both parquet scans (min/max row-group
    skip); Catalyst infers the filter on the orders side from the join key."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_orderkey") >= 500) & (F.col("l_orderkey") < 1500)
    )
    orders = table(spark, sf_dir, "orders")
    return li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey", "l_linenumber", "o_orderpriority", "l_extendedprice"
    )
