"""Catalog batch 7: the M1 flagship — the DVF monthly-stats pipeline shape
(SURVEY §3.2 step 3) as ONE oracle-checked query on the star schema."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.plans.catalog import register, table

MONEY = "decimal(18,2)"


@register(
    "m1_dvf_stats_shape",
    oracle="""
    WITH sales AS (
      SELECT DISTINCT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
             o.o_orderdate, o.o_orderpriority, c.c_nationkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        AND o.o_totalprice < 400000
    ), mono AS (
      SELECT o_custkey FROM sales GROUP BY o_custkey HAVING COUNT(*) >= 2
    ), enriched AS (
      SELECT s.*, n.n_name,
             strftime(date_trunc('month', s.o_orderdate), '%Y-%m') AS month
      FROM sales s
      JOIN nation n ON s.c_nationkey = n.n_nationkey
      WHERE s.o_custkey IN (SELECT o_custkey FROM mono)
    )
    SELECT n_name, month,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS nb_ventes_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS nb_ventes_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0) AS moy_prix_f,
           quantile_cont(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 0.5) AS med_prix_f,
           COUNT(*) AS nb_total
    FROM enriched
    GROUP BY n_name, month
    """,
    tags=["M1", "O4", "J1", "P3", "J8", "A1", "A2", "A13", "pivot"],
)
def m1_dvf_stats_shape(spark, sf_dir):
    """§3.2 step 3 — the reference's heaviest relational workload
    (dvf/explore/task_functions.py:415-827) mapped to the star schema:

    dedup (O4) -> broadcast dim join (J1) -> nature/type filters (P3) ->
    multi-sale semi-join (J8/P8 shape) -> per-geo x month grouped
    count/avg/exact-median with status pivot columns (A1/A2 + the
    nb_ventes_* / moy_prix_* naming convention, :555-560). One lineage,
    two shuffles (dedup, final agg); the semi-join reuses the agg shuffle.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")

    sales = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority", "c_nationkey",
        )
        .where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
            & (F.col("o_totalprice") < 400000)
        )
        .dropDuplicates()
    )
    multi = sales.groupBy("o_custkey").count().where(F.col("count") >= 2).select("o_custkey")
    enriched = (
        sales.join(multi, "o_custkey", "left_semi")
        .join(F.broadcast(nation), sales["c_nationkey"] == nation["n_nationkey"])
        .withColumn(
            "month", F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
        )
    )
    is_f = F.col("o_orderstatus") == "F"
    nb_f = F.sum(F.when(is_f, 1).otherwise(0))
    return enriched.groupBy("n_name", "month").agg(
        nb_f.alias("nb_ventes_f"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("nb_ventes_o"),
        (
            F.sum(F.when(is_f, F.col("o_totalprice").cast(MONEY))).cast("double")
            / F.nullif(nb_f, F.lit(0))
        ).alias("moy_prix_f"),
        F.percentile(F.when(is_f, F.col("o_totalprice")), F.lit(0.5)).alias("med_prix_f"),
        F.count(F.lit(1)).alias("nb_total"),
    )


@register(
    "w5_session_windows",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(CASE WHEN prev_us IS NULL
                        OR epoch_us(ts) - prev_us >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_n
      FROM l
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS nb
    FROM s GROUP BY user_id, session_n
    """,
    tags=["W1", "ST4", "session-window"],
)
def w5_session_windows(spark, sf_dir):
    """Built-in ``session_window`` aggregation (streaming/availablenow.py:
    session_window_counts) checked against first-principles lag/cumsum
    sessionization: windows are half-open [start, last_event + gap), so the
    oracle's session break is ``diff >= gap`` (strict ``>`` would disagree
    whenever two events sit exactly one gap apart)."""
    from datagouvfr_data_pipelines_spark.streaming.availablenow import (
        session_window_counts,
    )

    ev = table(spark, sf_dir, "events")
    return session_window_counts(ev, "ts", ["user_id"], gap="30 minutes")


@register(
    "a18_winsorize",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           least(greatest(CAST(o.o_totalprice AS DOUBLE), b.lo), b.hi)
             AS o_totalprice_w
    FROM orders o JOIN b USING (o_orderpriority)
    """,
    tags=["A18", "winsorize"],
)
def a18_winsorize(spark, sf_dir):
    """Per-group percentile clipping (operators/aggregates.py:winsorize):
    order totals clipped to each priority class's exact [p5, p95] — the
    outlier gate in front of heavy-tailed aggregates."""
    from datagouvfr_data_pipelines_spark.operators.aggregates import winsorize

    orders = table(spark, sf_dir, "orders")
    return winsorize(
        orders, "o_totalprice", ["o_orderpriority"], lower=0.05, upper=0.95
    ).select("o_orderkey", "o_orderpriority", "o_totalprice_w")
