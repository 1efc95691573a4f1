"""Relational query catalog (SURVEY §2.2-§2.7 operator inventory).

Every query is the Spark-first expression of a reference behavior (cited per
query) plus a DuckDB oracle. Determinism rules:

- double sums/avgs go through DECIMAL(18,2) (see operators/aggregates.py);
- every computed column is aliased identically on both sides;
- integer-ish outputs are cast explicitly (DuckDB SUM(int) is HUGEINT,
  year() is BIGINT — both cast to match Spark's types);
- windows always carry a unique tiebreaker column in ORDER BY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from datagouvfr_data_pipelines_spark.operators.aggregates import (
    conditional_count_agg,
    davg,
    dmedian,
    dsum,
    dsum_product,
    grouped_with_total,
    zero_fill_combinations,
)
from datagouvfr_data_pipelines_spark.operators.cleaning import add_lineage, conform_schema
from datagouvfr_data_pipelines_spark.operators.joins import (
    anti_join,
    asof_join_backward,
    broadcast_enrich,
    full_outer_coalesce,
    join_aggregated,
    semi_join,
)
from datagouvfr_data_pipelines_spark.operators.setops import cdc_diff, union_align
from datagouvfr_data_pipelines_spark.operators.windows import keep_best_row, session_ids
from datagouvfr_data_pipelines_spark.plans.catalog import register, table

MONEY = "decimal(18,2)"


# --------------------------------------------------------------------------
# A-family: aggregations
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=["A1", "A3", "P3"],
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship: grouped count/sum/avg block — the DVF stats-by-group shape
    (dvf/explore/task_functions.py:544-588) on TPC-H Q1's frame.

    Round 12: the filtered scan is fanned on the orderkey (session.fan_out,
    no-op on wide inputs) — the five decimal accumulators are the query's
    whole cost (BigDecimal adds per row), and on a narrow scan the partial
    aggregate otherwise runs inside the single scan task (measured 1.26 s
    -> 0.75 s at sf0.1, single-row-group files)."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    li = fan_out(
        table(spark, sf_dir, "lineitem").where(
            F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
        ),
        "l_orderkey",
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum_product("l_extendedprice", F.lit(1) - F.col("l_discount"), "sum_disc_price"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "a2_median_by_flag",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=["A2"],
)
def a2_median_by_flag(spark, sf_dir):
    """A2: exact interpolated median per group — pandas-median parity
    (dvf/explore/task_functions.py:562-588); exact percentile, not approx."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dmedian("l_extendedprice", "median_price"),
        dmedian("l_quantity", "median_qty"),
        davg("l_extendedprice", "avg_price"),
    )


@register(
    "a4_event_segment_counts",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nb_click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS nb_view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS nb_purchase,
           CAST(SUM(CASE WHEN event_type IN ('signup', 'error') THEN 1 ELSE 0 END) AS BIGINT) AS nb_other,
           COUNT(*) AS nb_total
    FROM events GROUP BY CAST(ts AS DATE)
    """,
    tags=["A4", "A16"],
)
def a4_event_segment_counts(spark, sf_dir):
    """A4: one-pass conditional-count aggregation — the per-(date, object)
    segment counting of dgv/metrics/task_functions.py:226-262."""
    ev = table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    return conditional_count_agg(
        ev,
        ["event_date"],
        {
            "nb_click": F.col("event_type") == "click",
            "nb_view": F.col("event_type") == "view",
            "nb_purchase": F.col("event_type") == "purchase",
            "nb_other": F.col("event_type").isin("signup", "error"),
        },
    )


@register(
    "a5_minmax_dates",
    oracle="""
    SELECT o_orderpriority, MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order,
           COUNT(*) AS nb_orders
    FROM orders GROUP BY o_orderpriority
    """,
    tags=["A5"],
)
def a5_minmax_dates(spark, sf_dir):
    """A5: min/max aggregate (meteo/pg_processing/task_functions.py:208-219)."""
    return table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("nb_orders"),
    )


@register(
    "a6_value_counts",
    oracle="SELECT c_mktsegment, COUNT(*) AS nb FROM customer GROUP BY c_mktsegment",
    tags=["A6"],
)
def a6_value_counts(spark, sf_dir):
    """A6: value_counts (dvf/explore/task_functions.py:393-395)."""
    return table(spark, sf_dir, "customer").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("nb")
    )


@register(
    "a7_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nb_parts,
           COUNT(DISTINCT l_suppkey) AS nb_supps,
           COUNT(*) AS nb_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=["A7"],
)
def a7_distinct_counts(spark, sf_dir):
    """A7: nunique (dvf/explore/task_functions.py:183-188)."""
    return table(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nb_parts"),
        F.countDistinct("l_suppkey").alias("nb_supps"),
        F.count(F.lit(1)).alias("nb_rows"),
    )


@register(
    "a9_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, t.total_spent
    FROM (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
          FROM orders GROUP BY o_custkey) t
    JOIN customer c ON c.c_custkey = t.o_custkey
    ORDER BY t.total_spent DESC, c.c_custkey LIMIT 10
    """,
    tags=["A9", "J1"],
)
def a9_top_customers(spark, sf_dir):
    """A9: top-K by metric then enrich (dgv/impact/task_functions.py:30-40).
    Sort-limit compiles to TakeOrdered — no full sort at scale."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    totals = orders.groupBy("o_custkey").agg(dsum("o_totalprice", "total_spent"))
    top = totals.orderBy(F.col("total_spent").desc(), F.col("o_custkey").asc()).limit(10)
    return broadcast_enrich(
        top, cust, top["o_custkey"] == cust["c_custkey"], "inner"
    ).select("c_custkey", "c_name", "total_spent")


@register(
    "a13_rollup_totals",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS nb_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
           CAST(GROUPING(r_name, n_name) AS INTEGER) AS grouping_level
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    tags=["A13", "A14", "J1"],
)
def a13_rollup_totals(spark, sf_dir):
    """A13/A14: grouped + higher-level totals in ONE rollup pass, replacing
    the reference's manual union of a national row
    (dvf/explore/task_functions.py:632-676)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = broadcast_enrich(
        cust, nation, cust["c_nationkey"] == nation["n_nationkey"], "inner"
    )
    joined = broadcast_enrich(
        joined, region, joined["n_regionkey"] == region["r_regionkey"], "inner"
    )
    return grouped_with_total(
        joined,
        ["r_name", "n_name"],
        [
            F.count(F.lit(1)).alias("nb_customers"),
            dsum("c_acctbal", "sum_acctbal"),
        ],
    )


@register(
    "a12_zero_fill",
    oracle="""
    WITH agg AS (
      SELECT n_name, o_orderpriority, COUNT(*) AS nb_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, o_orderpriority
    ), dims AS (
      SELECT n_name, o_orderpriority
      FROM nation CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
    )
    SELECT d.n_name, d.o_orderpriority, COALESCE(a.nb_orders, 0) AS nb_orders
    FROM dims d LEFT JOIN agg a ON d.n_name = a.n_name AND d.o_orderpriority = a.o_orderpriority
    """,
    tags=["A12", "J10"],
)
def a12_zero_fill(spark, sf_dir):
    """A12: zero-fill missing group combos against the dim universe
    (carburants/scripts/generate_kpis_rupture.py:137-159)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).join(
        F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"]
    )
    agg = joined.groupBy("n_name", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("nb_orders")
    )
    dims = nation.select("n_name").crossJoin(
        orders.select("o_orderpriority").distinct()
    )
    return zero_fill_combinations(agg, dims, ["n_name", "o_orderpriority"], {"nb_orders": 0})


@register(
    "a15_variance_stats",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           s1 / n AS mean_price,
           (s2 - s1 * s1 / n) / (n - 1) AS var_price
    FROM s
    """,
    tags=["A15"],
)
def a15_variance_stats(spark, sf_dir):
    """A15: mean/variance via exact decimal moments (geocode.py:663-696) —
    shuffle-order-independent, unlike float var_samp."""
    orders = table(spark, sf_dir, "orders")
    c = F.col("o_totalprice").cast(MONEY)
    s = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).cast("double").alias("s1"),
        F.sum(c * c).cast("double").alias("s2"),
    )
    return s.select(
        "o_orderstatus",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_price"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var_price"
        ),
    )


@register(
    "a16_monthly_rollup",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           o_orderpriority,
           COUNT(*) AS nb_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY 1, 2
    """,
    tags=["A16"],
)
def a16_monthly_rollup(spark, sf_dir):
    """A16: month-grain rollup (dgv/metrics/sql/create_tables.sql:209-263)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias("month"),
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("nb_orders"),
        dsum("o_totalprice", "sum_price"),
    )


# --------------------------------------------------------------------------
# J-family: joins
# --------------------------------------------------------------------------

@register(
    "j1_brand_revenue",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS nb_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=["J1", "A3"],
)
def j1_brand_revenue(spark, sf_dir):
    """J1: broadcast dim enrichment then aggregate
    (dvf/explore/task_functions.py:469-471 sales<-EPCI).

    Round 12: the fact scan is fanned on the join key before the
    broadcast enrich (the j18 pattern) — the broadcast join preserves the
    streamed side's partitioning, so join + decimal partial aggregation
    run at cluster width instead of inside a single narrow scan task."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    li = fan_out(table(spark, sf_dir, "lineitem"), "l_partkey")
    part = table(spark, sf_dir, "part")
    joined = broadcast_enrich(li, part, li["l_partkey"] == part["p_partkey"], "inner")
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("nb_lines"),
        dsum_product("l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue"),
        davg("l_quantity", "avg_qty"),
    )


@register(
    "j4_full_outer_daily",
    oracle="""
    WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS nb_orders
               FROM orders GROUP BY 1),
         e AS (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS nb_events
               FROM events GROUP BY 1)
    SELECT COALESCE(o.d, e.d) AS d,
           COALESCE(o.nb_orders, 0) AS nb_orders,
           COALESCE(e.nb_events, 0) AS nb_events
    FROM o FULL JOIN e ON o.d = e.d
    """,
    tags=["J4"],
)
def j4_full_outer_daily(spark, sf_dir):
    """J4: FULL OUTER JOIN with coalesced keys — visits ⟗ matomo
    (dgv/metrics/sql/create_tables.sql:127-145)."""
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("nb_orders"))
    )
    e = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("nb_events"))
    )
    return full_outer_coalesce(o, e, ["d"]).na.fill({"nb_orders": 0, "nb_events": 0})


@register(
    "j5_customer_totals",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COALESCE(t.nb_orders, 0) AS nb_orders,
           COALESCE(t.total_spent, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS nb_orders,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
               FROM orders GROUP BY o_custkey) t
    ON c.c_custkey = t.o_custkey
    """,
    tags=["J5"],
)
def j5_customer_totals(spark, sf_dir):
    """J5: left join against an aggregated subquery
    (dgv/metrics/sql/create_tables.sql:139-144)."""
    cust = table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    orders = table(spark, sf_dir, "orders")
    out = join_aggregated(
        cust,
        orders,
        ["o_custkey"],
        [
            F.count(F.lit(1)).alias("nb_orders"),
            dsum("o_totalprice", "total_spent"),
        ],
    )
    return out.na.fill({"nb_orders": 0, "total_spent": 0.0}).select(
        F.col("o_custkey").alias("c_custkey"), "c_name", "nb_orders", "total_spent"
    )


@register(
    "j7_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=["J7"],
)
def j7_customers_without_orders(spark, sf_dir):
    """J7: anti-join (insee/deces/task_functions.py:179-187 opposition list)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_join(cust, orders, ["c_custkey"])


@register(
    "j8_parts_with_sales",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
    tags=["J8", "P8"],
)
def j8_parts_with_sales(spark, sf_dir):
    """J8: semi-join — mono-sale id filter shape
    (dvf/explore/task_functions.py:507-511)."""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return semi_join(part, li, ["p_partkey"])


@register(
    "j10_region_months",
    oracle="""
    SELECT r_name, CAST(m.month AS INTEGER) AS month,
           r_name || '-' || lpad(CAST(m.month AS VARCHAR), 2, '0') AS label
    FROM region CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS month) m
    """,
    tags=["J10"],
)
def j10_region_months(spark, sf_dir):
    """J10: small cross join — libelles x 12 months
    (dvf/explore/task_functions.py:773-779)."""
    region = table(spark, sf_dir, "region")
    months = spark.range(1, 13).select(F.col("id").cast("int").alias("month"))
    return region.crossJoin(F.broadcast(months)).select(
        "r_name",
        "month",
        F.concat(
            F.col("r_name"), F.lit("-"), F.lpad(F.col("month").cast("string"), 2, "0")
        ).alias("label"),
    )


@register(
    "j13_json_extract_agg",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k": ?(\\d+)', 1) AS INTEGER) AS k,
           COUNT(*) AS nb,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
    tags=["J13", "scalar-json"],
)
def j13_json_extract_agg(spark, sf_dir):
    """§2.8 JSON: extract a key from a JSON payload column then aggregate
    (coordonneesXY parse, schema/irve/geo_utils/geo.py:41-66)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.regexp_extract(F.col("props"), '"k": ?(\\d+)', 1).cast("int")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nb"), dsum("value", "sum_value"))
    )


@register(
    "j14_asof_last_order",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT MAX(o.o_orderdate) FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS last_order_ts
    FROM events e
    """,
    tags=["J14"],
)
def j14_asof_last_order(spark, sf_dir):
    """J14: backward as-of join — latest order snapshot at event time
    (dvf/geoloc/task_functions.py:271-303), via union+carry-forward window
    instead of the reference's retry loop."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    out = asof_join_backward(
        ev, orders, "user_id", "ts", "o_orderdate", ["o_orderdate"]
    )
    return out.select("event_id", "user_id", F.col("o_orderdate").alias("last_order_ts"))


# --------------------------------------------------------------------------
# W-family: windows
# --------------------------------------------------------------------------

@register(
    "w1_event_sessions",
    oracle="""
    SELECT event_id, user_id, CAST(session_n AS BIGINT) AS session_id
    FROM (
      SELECT event_id, user_id,
             SUM(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_n
      FROM (SELECT event_id, user_id, ts,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events)
    )
    """,
    tags=["W1", "ST4"],
)
def w1_event_sessions(spark, sf_dir):
    """W1: sessionization via lag/cumsum — the mutation-id assignment shape
    (dvf/geoloc/task_functions.py:257-268) with a 30-min gap."""
    ev = table(spark, sf_dir, "events")
    out = session_ids(ev, "user_id", "ts", 1800, tiebreak_cols=["event_id"])
    return out.select("event_id", "user_id", "session_id")


@register(
    "w2_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
    tags=["W2", "O5"],
)
def w2_latest_order_per_customer(spark, sf_dir):
    """W2/O5: deterministic keep-best-row dedup — NEVER dropDuplicates after
    sort (dgv/metrics/task_functions.py:198-201; SURVEY §4 rule 4)."""
    orders = table(spark, sf_dir, "orders")
    return keep_best_row(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "w3_running_customer_total",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    """,
    tags=["W1", "A3"],
)
def w3_running_customer_total(spark, sf_dir):
    """Cumulative per-key sum (decimal-exact) — the W1 cumsum family."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(MONEY)).over(w).cast("double").alias("running_total"),
    )


# --------------------------------------------------------------------------
# U-family: set ops / CDC
# --------------------------------------------------------------------------

@register(
    "u1_union_align",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority FROM orders
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority FROM orders
    """,
    tags=["U1", "P10"],
)
def u1_union_align(spark, sf_dir):
    """U1: unionByName with missing-column alignment
    (dvf/explore/task_functions.py:676,753)."""
    orders = table(spark, sf_dir, "orders")
    a = orders.select("o_orderkey", "o_totalprice")
    b = orders.select("o_orderkey", "o_orderpriority")
    return union_align([a, b]).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "u2_cdc_diff",
    oracle="""
    SELECT 'add' AS op, * FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      EXCEPT ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    )
    UNION ALL
    SELECT 'del' AS op, * FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      EXCEPT ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    )
    """,
    tags=["U2", "ST6"],
)
def u2_cdc_diff(spark, sf_dir):
    """U2: whole-row CDC diff between snapshots — additions + deletions
    (meteo/pg_processing/task_functions.py:448-479). Uses the counted
    single-shuffle form (operators/setops.py:cdc_diff_counted): exceptAll
    both ways shuffles both snapshots twice; the weighted groupBy shuffles
    the union once — the difference is 4 full-table shuffles vs 1 at 100 TB."""
    from datagouvfr_data_pipelines_spark.operators.setops import cdc_diff_counted

    orders = table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    old = orders.where(F.col("o_orderdate") < "1997-01-01").select(*cols)
    new = orders.where(F.col("o_orderdate") < "1998-01-01").select(*cols)
    return cdc_diff_counted(new, old)


# --------------------------------------------------------------------------
# P-family: projections / filters / scalar functions
# --------------------------------------------------------------------------

@register(
    "p3_filter_derive",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'mid' ELSE 'big' END AS qty_bucket,
           CAST(month(l_shipdate) AS INTEGER) AS ship_month
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_returnflag IN ('A', 'R')
    """,
    tags=["P3", "P5", "P6"],
)
def p3_filter_derive(spark, sf_dir):
    """P3/P5/P6: predicate filters + derived arithmetic + CASE bucketing
    (dvf/explore/task_functions.py:446-451,497-527; generate_kpis_rupture.py:17-46).
    Filters are plain predicates so they push down to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_shipdate").between("1996-01-01", "1998-12-31")
            & F.col("l_discount").between(0.02, 0.09)
            & F.col("l_returnflag").isin("A", "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.when(F.col("l_quantity") < 10, "small")
            .when(F.col("l_quantity") < 30, "mid")
            .otherwise("big")
            .alias("qty_bucket"),
            F.month("l_shipdate").cast("int").alias("ship_month"),
        )
    )


@register(
    "p8_mono_order_customers",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 COUNT(*) OVER (PARTITION BY o_custkey) AS n
          FROM orders)
    WHERE n = 1
    """,
    tags=["P8", "W2"],
)
def p8_mono_order_customers(spark, sf_dir):
    """P8: keep rows whose key-group count == 1 — mono-property sales
    (dvf/explore/task_functions.py:507-511), window form (one shuffle)."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("n", F.count(F.lit(1)).over(w))
        .where(F.col("n") == 1)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "p10_conform_schema",
    oracle="""
    SELECT o_orderkey,
           o_totalprice,
           CAST(NULL AS VARCHAR) AS source_system,
           CAST(NULL AS INTEGER) AS ingest_priority,
           'batch-2026' AS ingest_batch
    FROM orders
    """,
    tags=["P10", "P11"],
)
def p10_conform_schema(spark, sf_dir):
    """P10/P11: conform to a target schema (missing cols -> typed NULLs) and
    inject lineage constants (schema/utils/consolidation.py:977-1006)."""
    orders = table(spark, sf_dir, "orders")
    out = conform_schema(
        orders,
        ["o_orderkey", "o_totalprice", "source_system", "ingest_priority"],
        types={"source_system": "string", "ingest_priority": "int"},
    )
    return add_lineage(out, ingest_batch="batch-2026")


@register(
    "scalar_dates",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month_label,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch_start
    FROM orders
    """,
    tags=["scalar-date"],
)
def scalar_dates(spark, sf_dir):
    """§2.8 date family: trunc, extract, month arithmetic, day diffs
    (utils/utils.py:33-81; create_tables.sql:214)."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias(
            "month_label"
        ),
        F.add_months(F.to_date("o_orderdate"), 3).alias("plus3m"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@register(
    "scalar_strings",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           substr(p_brand, 7, 2) AS brand_code,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(length(p_name) AS INTEGER) AS name_len,
           regexp_replace(lower(p_name), '\\s+', '-', 'g') AS slug,
           starts_with(p_type, 'PROMO') AS is_promo
    FROM part
    """,
    tags=["scalar-string", "P9"],
)
def scalar_strings(spark, sf_dir):
    """§2.8 string family: pad/substr/split/regex/case ops
    (dvf/geoloc:87-108 rjust, dfi:50-51 lpad, consolidation.py:953-970)."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.substring("p_brand", 7, 2).alias("brand_code"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_replace(F.lower(F.col("p_name")), "\\s+", "-").alias("slug"),
        F.col("p_type").startswith("PROMO").alias("is_promo"),
    )


@register(
    "s5_fixed_width",
    oracle="""
    SELECT doc_id,
           trim(substr(text, 1, 16)) AS f_head,
           trim(substr(text, 17, 12)) AS f_mid,
           CAST(length(text) AS INTEGER) AS reclen
    FROM documents
    """,
    tags=["S5"],
)
def s5_fixed_width(spark, sf_dir):
    """S5: fixed-width byte-offset field slicing — INSEE deaths file parse
    (insee/deces/task_functions.py:71-90) as column expressions, no UDF."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.trim(F.substring("text", 1, 16)).alias("f_head"),
        F.trim(F.substring("text", 17, 12)).alias("f_mid"),
        F.length("text").cast("int").alias("reclen"),
    )


@register(
    "sql_metrics_pyramid",
    oracle="""
    WITH daily_orders AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS nb_orders
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    daily_events AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS nb_events
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    metrics_daily AS (
      SELECT COALESCE(o.d, e.d) AS d,
             COALESCE(o.nb_orders, 0) AS nb_orders,
             COALESCE(e.nb_events, 0) AS nb_events
      FROM daily_orders o FULL JOIN daily_events e ON o.d = e.d
    )
    SELECT strftime(d, '%Y-%m') AS metric_month,
           CAST(SUM(nb_orders) AS BIGINT) AS monthly_orders,
           CAST(SUM(nb_events) AS BIGINT) AS monthly_events
    FROM metrics_daily GROUP BY strftime(d, '%Y-%m')
    """,
    tags=["J4", "sql-front-door", "pyramid"],
)
def sql_metrics_pyramid(spark, sf_dir):
    """The reference's materialized-view pyramid ported as SQL TEXT through
    the SQL front door (plans/sqlviews.py:run_sql_views): daily per-table
    aggregates -> J4 full-outer coalesced merge -> monthly rollup — the
    create_tables.sql:127-342 shape pasted as SELECTs, executed as
    ordinary Catalyst plans. The same views in DataFrame form
    (j4_full_outer_daily) compile to the same physical plan — test-pinned
    in tests/test_sqlviews.py."""
    from datagouvfr_data_pipelines_spark.plans.sqlviews import run_sql_views

    views = {
        "mv_daily_orders": """
            SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS nb_orders
            FROM mv_orders GROUP BY CAST(o_orderdate AS DATE)""",
        "mv_daily_events": """
            SELECT CAST(ts AS DATE) AS d, COUNT(*) AS nb_events
            FROM mv_events GROUP BY CAST(ts AS DATE)""",
        "mv_metrics_daily": """
            SELECT COALESCE(o.d, e.d) AS d,
                   COALESCE(o.nb_orders, 0) AS nb_orders,
                   COALESCE(e.nb_events, 0) AS nb_events
            FROM mv_daily_orders o FULL JOIN mv_daily_events e ON o.d = e.d""",
        "mv_metrics_monthly": """
            SELECT date_format(d, 'yyyy-MM') AS metric_month,
                   SUM(nb_orders) AS monthly_orders,
                   SUM(nb_events) AS monthly_events
            FROM mv_metrics_daily GROUP BY date_format(d, 'yyyy-MM')""",
    }
    out = run_sql_views(
        spark,
        views,
        base={
            "mv_orders": table(spark, sf_dir, "orders"),
            "mv_events": table(spark, sf_dir, "events"),
        },
    )
    return out["mv_metrics_monthly"]
