"""Catalog batch 10 (round 3): classic OLAP flagships (TPC-H Q3/Q5 shapes),
CUBE totals, market-basket co-occurrence, last-touch attribution, IQR
outlier gating, Markov transition stats, and the grid-bucketed
nearest-neighbor geo join.

Determinism notes (oracle bit-parity): money aggregates follow the decimal
policy in operators/aggregates.py; probabilities/ratios are single IEEE
divisions of BIGINT counts; nearest-join distances are pure +,*,- double
arithmetic (no transcendentals) so both engines produce identical bits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from datagouvfr_data_pipelines_spark.operators.aggregates import (
    davg,
    dsum,
    dsum_product,
)
from datagouvfr_data_pipelines_spark.plans.catalog import register, table
from datagouvfr_data_pipelines_spark.plans.relational6 import (
    _LAT_SQL,
    _LON_SQL,
    _lat,
    _lon,
)


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=["flagship", "J1", "A3", "O3", "tpch-q3"],
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join with both-side date pushdown, decimal-
    exact revenue, top-10. The customer filter broadcasts (dim after
    filter << threshold); orders⋈lineitem shuffles on orderkey — the join
    AQE would pick at any scale. Ties in revenue break on orderkey so the
    limit is total-order deterministic."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_product("l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue"))
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            "revenue",
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY n.n_name
    """,
    tags=["flagship", "J1", "A3", "tpch-q5"],
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join where supplier and customer must share
    a nation. All dims (region/nation/customer-filtered/supplier) broadcast;
    the only shuffle is orders⋈lineitem on orderkey. The extra
    s_nationkey = c_nationkey equi-condition rides the supplier broadcast
    join — no second exchange."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    cn = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    fact = l.join(o, l.l_orderkey == o.o_orderkey).join(
        F.broadcast(cn), o.o_custkey == cn.c_custkey
    )
    fact = fact.join(
        F.broadcast(s),
        (fact.l_suppkey == s.s_suppkey) & (fact.c_nationkey == s.s_nationkey),
    )
    return fact.groupBy("n_name").agg(
        dsum_product("l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue")
    )


@register(
    "a24_cube_stats",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS nb,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=["A13", "A14", "cube"],
)
def a24_cube_stats(spark, sf_dir):
    """CUBE over (status, priority): all four grouping sets in ONE pass
    (partial-aggregated expand, same engine mechanics as the A13 rollup).
    Group keys are never null in the data, so COALESCE('ALL') is an
    unambiguous subtotal sentinel on both engines."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("nb"), dsum("o_totalprice", "total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "nb",
            "total",
        )
    )


@register(
    "j18_brand_affinity",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS nb_orders
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY a.p_brand, b.p_brand
    ORDER BY nb_orders DESC, brand_a, brand_b
    LIMIT 25
    """,
    tags=["J11", "basket", "co-occurrence"],
)
def j18_brand_affinity(spark, sf_dir):
    """Market-basket pairwise co-occurrence: brands bought together in one
    order. Broadcast part enrich -> ONE shuffle on orderkey collecting the
    per-order distinct brand set (map-side partial collect_set), then the
    sorted-array pair expansion runs entirely JVM-side (transform/slice/
    flatten + a single explode). Compared to the naive distinct + self-join
    this removes both the second shuffle and the duplicated scan subtree;
    fan-out stays bounded by basket size (small constant), so pair
    generation is linear in orders at any scale.

    Round-9 formulation audit (measured at 10x sf0.1, 64k row groups,
    median of 5): this form 4.7 s; distinct + orderkey self-join (the
    DuckDB plan shape) 4.7 s with an extra shuffle; dense-int brand codes
    + code pairs 4% faster (not worth the driver-side code map); per-order
    brand BITMASK via bit_or + per-distinct-mask pair expansion 5.8 s
    (the mask space barely collapses at ~4 lines/order over 25 brands, so
    the 300-candidate filter dominates). Keeping the measured best.

    Round-11 scale fix: ``fan_out`` on the orderkey at the SCAN, before
    the broadcast enrich. On a narrow input (few row groups / low
    shuffle-partition sessions) the map-side partial collect_set builds a
    hash map over ~every distinct orderkey per task — at 10x that map
    outgrew cache and the whole basket+pair stage ran at the session's
    8-way floor. Hash-repartitioning the compact (orderkey, partkey)
    stream to cluster parallelism fires on the scan frame (exact width;
    fan_out can't see through a join), the broadcast join preserves the
    streamed side's partitioning, so the exchange doubles as the groupBy
    shuffle (the partial agg's 1.5M-key map is never built) and the pair
    explode runs at full width: 3.22 s -> 2.45 s at 10x (median of 4,
    clearCache + fresh-plan protocol). No-op at real scale where the scan
    is already wide — partial aggregation is preserved there."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    brands = (
        fan_out(l.select("l_orderkey", "l_partkey"), "l_orderkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
        .where(F.size("bs") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            "bs",
            lambda x, i: F.transform(
                F.slice("bs", i + 2, F.size("bs")),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    return (
        brands.select(F.explode(pairs).alias("pr"))
        .groupBy(
            F.col("pr.brand_a").alias("brand_a"),
            F.col("pr.brand_b").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("nb_orders"))
        .orderBy(F.desc("nb_orders"), "brand_a", "brand_b")
        .limit(25)
    )


@register(
    "w10_last_touch_attribution",
    oracle="""
    WITH attributed AS (
      SELECT event_id, event_type,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'none') AS channel,
           COUNT(*) AS nb_purchases
    FROM attributed WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=["window", "attribution", "events"],
)
def w10_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the user's most
    recent preceding non-purchase event type (ignore-nulls carry-forward
    over a (ts, event_id) total order — same one-window-shuffle shape as
    the W1 sessionizer). Purchases with no prior touch fall into 'none'."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    attributed = ev.withColumn("channel", F.last(touch, ignorenulls=True).over(w))
    return (
        attributed.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("none")).alias("channel"))
        .agg(F.count(F.lit(1)).alias("nb_purchases"))
    )


@register(
    "a26_iqr_outliers",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.75) AS q3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           b.q1, b.q3,
           COUNT(*) AS nb_rows,
           CAST(SUM(CASE WHEN l.l_extendedprice < b.q1 - 1.5 * (b.q3 - b.q1)
                           OR l.l_extendedprice > b.q3 + 1.5 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS nb_outliers
    FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag, b.q1, b.q3
    """,
    tags=["A8", "quality", "outliers"],
)
def a26_iqr_outliers(spark, sf_dir):
    """Per-group IQR outlier gate (robust ML-prep filter): exact quartiles
    per group (tiny result) broadcast back onto the fact scan, fences as
    pure double arithmetic, one counting pass. Two jobs, one fact shuffle —
    the same two-phase shape as winsorize/standardize."""
    li = table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.25)).alias("q1"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("l_extendedprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("l_extendedprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        li.join(F.broadcast(bounds), on="l_returnflag")
        .groupBy("l_returnflag", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("nb_rows"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("nb_outliers"),
        )
    )


@register(
    "e_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS nb
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, nb,
           CAST(nb AS DOUBLE) / CAST(SUM(nb) OVER (PARTITION BY prev_type) AS DOUBLE)
             AS prob
    FROM t
    """,
    tags=["window", "markov", "events"],
)
def e_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user event types: lag over
    the per-user total order, count (prev, next) pairs, normalize per
    prev-state. The probability is ONE IEEE division of two BIGINTs —
    engine-portable bits. Transition counts are tiny (|types|^2 rows), so
    the normalizing window costs nothing after the count shuffle."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    t = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    wp = Window.partitionBy("prev_type")
    return t.withColumn(
        "prob",
        F.col("nb").cast("double") / F.sum("nb").over(wp).cast("double"),
    )


@register(
    "e_funnel_conversion",
    oracle="""
    WITH codes AS (
      SELECT user_id,
             list(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                       WHEN 'purchase' THEN 3 ELSE 0 END
                  ORDER BY ts, event_id) AS evs
      FROM events GROUP BY user_id
    ),
    stages AS (
      SELECT user_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(evs, x -> CAST(x AS BIGINT))),
               (acc, x) -> CASE WHEN acc = 0 AND x = 1 THEN 1
                                WHEN acc = 1 AND x = 2 THEN 2
                                WHEN acc = 2 AND x = 3 THEN 3
                                ELSE acc END) AS stage
      FROM codes
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN stage >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN stage >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN stage >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN stage >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / greatest(SUM(CASE WHEN stage >= 1 THEN 1 ELSE 0 END), 1)
             AS view_to_click,
           CAST(SUM(CASE WHEN stage >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
             / greatest(SUM(CASE WHEN stage >= 2 THEN 1 ELSE 0 END), 1)
             AS click_to_purchase
    FROM stages
    """,
    tags=["events", "funnel"],
)
def e_funnel_conversion(spark, sf_dir):
    """Ordered funnel conversion (view -> click -> purchase): each user's
    events are folded IN (ts, event_id) ORDER through a 4-state machine —
    a later step only counts after an earlier one, the strict-sequence
    semantics the min-timestamp-per-step shortcut gets wrong when a
    purchase precedes the first view. One shuffle (groupBy user collects
    the ordered code list), then a partial-combined global aggregate;
    the fold is a JVM higher-order expression, no UDF, and reproduces in
    DuckDB's list_reduce verbatim. Conversion ratios are single IEEE
    divisions of exact bigints."""
    ev = table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 3)
        .otherwise(0)
    )
    per_user = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), code.cast("long").alias("c")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("evs"))
        .select(
            "user_id",
            F.aggregate(
                F.transform(F.col("evs"), lambda e: e["c"]),
                F.lit(0).cast("long"),
                lambda acc, x: F.when((acc == 0) & (x == 1), F.lit(1).cast("long"))
                .when((acc == 1) & (x == 2), F.lit(2).cast("long"))
                .when((acc == 2) & (x == 3), F.lit(3).cast("long"))
                .otherwise(acc),
            ).alias("stage"),
        )
    )
    n1 = F.sum(F.when(F.col("stage") >= 1, 1).otherwise(0)).cast("bigint")
    n2 = F.sum(F.when(F.col("stage") >= 2, 1).otherwise(0)).cast("bigint")
    n3 = F.sum(F.when(F.col("stage") >= 3, 1).otherwise(0)).cast("bigint")
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        n1.alias("n_view"),
        n2.alias("n_click"),
        n3.alias("n_purchase"),
    ).select(
        "n_users",
        "n_view",
        "n_click",
        "n_purchase",
        (
            F.col("n_click").cast("double")
            / F.greatest(F.col("n_view"), F.lit(1))
        ).alias("view_to_click"),
        (
            F.col("n_purchase").cast("double")
            / F.greatest(F.col("n_click"), F.lit(1))
        ).alias("click_to_purchase"),
    )


@register(
    "e_retention_cohorts",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INTEGER)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tags=["events", "retention", "cohort"],
)
def e_retention_cohorts(spark, sf_dir):
    """Weekly retention cohort matrix: users grouped by first-activity
    week, counted once per (cohort, week-offset) they were active in —
    the triangle chart behind every retention dashboard. Two shuffles on
    user_id (first-week aggregate, then the distinct-activity join; both
    hash-partition on the same key so AQE reuses the exchange), then one
    partial-combined count on the tiny (cohort, offset) grid. Week
    truncation and the day-diff/7 offset are exact integer calendar
    arithmetic — no floats anywhere."""
    ev = table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = ev.select("user_id", wk.alias("week")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "e_last_touch_attribution",
    oracle="""
    WITH tl AS (
      SELECT user_id, event_id, event_type, ts,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS touch
      FROM events
    )
    SELECT coalesce(touch, 'none') AS touch,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM tl WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=["events", "attribution"],
)
def e_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent NON-purchase event (consecutive purchases look through to the
    true touch — plain lag(1) gets this wrong), 'none' when a purchase
    opens the timeline. One user-partitioned window (bounded per-user
    data, never a global sort) + a tiny |event_types| count."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("none")).alias("touch"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


@register(
    "geo_nearest_join",
    oracle=f"""
    WITH cw AS (
      SELECT 360.0 / GREATEST(1.0, CEIL(SQRT(COUNT(*) / 4.0))) AS w
      FROM events WHERE event_type = 'signup'
    ),
    pts AS (
      SELECT event_id AS station_id, lon, lat,
             CAST(FLOOR(lon / (SELECT w FROM cw)) AS BIGINT) AS cx,
             CAST(FLOOR(lat / (SELECT w FROM cw)) AS BIGINT) AS cy
      FROM (SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat
            FROM events WHERE event_type = 'signup')
    ),
    pr AS (
      SELECT event_id, lon, lat,
             CAST(FLOOR(lon / (SELECT w FROM cw)) AS BIGINT) AS cx,
             CAST(FLOOR(lat / (SELECT w FROM cw)) AS BIGINT) AS cy
      FROM (SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat
            FROM events WHERE event_type = 'purchase')
    ),
    cand AS (
      SELECT pr.event_id, pts.station_id,
             (pr.lon - pts.lon) * (pr.lon - pts.lon)
               + (pr.lat - pts.lat) * (pr.lat - pts.lat) AS sqdist,
             ROW_NUMBER() OVER (
               PARTITION BY pr.event_id ORDER BY
                 (pr.lon - pts.lon) * (pr.lon - pts.lon)
                   + (pr.lat - pts.lat) * (pr.lat - pts.lat),
                 pts.station_id
             ) AS rn
      FROM pr
      JOIN (VALUES (-1), (0), (1)) dxs(dx) ON TRUE
      JOIN (VALUES (-1), (0), (1)) dys(dy) ON TRUE
      JOIN pts ON pts.cx = pr.cx + dx AND pts.cy = pr.cy + dy
    )
    SELECT event_id, station_id, sqdist FROM cand WHERE rn = 1
    """,
    tags=["geo", "join", "nearest-neighbor"],
)
def geo_nearest_join(spark, sf_dir):
    """Grid-bucketed nearest-neighbor join (operators/joins.py:
    nearest_neighbor_join): purchase points matched to their closest signup
    'station' through a 3x3 cell-neighborhood equi-join — one shuffle on
    the cell key, per-probe argmin as min(struct), never all-pairs. The
    reference's geocoding nearest-match semantics (utils/geo.py) at
    cluster scale. Distances are pure-arithmetic planar squares (bit-
    identical across engines); production would swap in haversine with the
    same plan shape.

    Round 10: the cell width is DENSITY-ADAPTIVE (cell_size=None ->
    operators/joins.py:adaptive_cell_size) — the full-suite scale sweep
    measured the old fixed 10-degree grid going 1.9 s -> 501 s from 1x
    to 10x (per-cell population, hence candidates, grows linearly with
    the corpus; the equivalent fixed-cell DuckDB oracle OOMed then
    filled the disk at 10x). The width rule is deterministic arithmetic
    the oracle replicates in a scalar subquery, so the SAME
    neighborhoods are searched on both engines at any SF."""
    from datagouvfr_data_pipelines_spark.operators.joins import (
        nearest_neighbor_join,
    )

    ev = table(spark, sf_dir, "events")
    pts = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("station_id"),
        _lon().alias("lon"),
        _lat().alias("lat"),
    )
    pr = ev.where(F.col("event_type") == "purchase").select(
        "event_id", _lon().alias("lon"), _lat().alias("lat")
    )
    return nearest_neighbor_join(
        pr, pts, probe_id="event_id", point_id="station_id", cell_size=None
    )


@register(
    "e_top_session_paths",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id, ts, event_type,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_us
      FROM events
    ),
    sess AS (
      SELECT event_id, user_id, ts, event_type,
             SUM(CASE WHEN prev_us IS NULL
                       OR epoch_us(ts) - prev_us > 1800000000
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_n
      FROM lagged
    ),
    paths AS (
      SELECT user_id, session_n,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, session_n
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 10
    """,
    tags=["events", "sessions", "paths"],
)
def e_top_session_paths(spark, sf_dir):
    """Top-10 session paths: 30-min-gap sessionization (the W1 operator),
    each session's events concatenated IN (ts, event_id) ORDER into a
    'view>click>purchase' path string, counted corpus-wide — the path
    analysis behind every UX funnel redesign. Composition evidence: the
    session_ids operator feeds a per-session ordered fold, one extra
    shuffle on the (user, session) key, then a tiny path-keyed count +
    TakeOrdered."""
    from datagouvfr_data_pipelines_spark.operators.windows import session_ids

    ev = table(spark, sf_dir, "events")
    s = session_ids(ev, "user_id", "ts", 1800, tiebreak_cols=["event_id"])
    paths = s.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                lambda e: e["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(10)
    )


@register(
    "e_dau_wau_mau",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
    ),
    dau AS (
      SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau FROM d
      GROUP BY day
    ),
    wau AS (
      SELECT d2.day,
             CAST(COUNT(DISTINCT d7.user_id) AS BIGINT) AS wau
      FROM (SELECT DISTINCT day FROM d) d2
      JOIN d d7 ON d7.day > d2.day - 7 AND d7.day <= d2.day
      GROUP BY d2.day
    ),
    mau AS (
      SELECT d2.day,
             CAST(COUNT(DISTINCT d30.user_id) AS BIGINT) AS mau
      FROM (SELECT DISTINCT day FROM d) d2
      JOIN d d30 ON d30.day > d2.day - 30 AND d30.day <= d2.day
      GROUP BY d2.day
    )
    SELECT dau.day, dau.dau, wau.wau, mau.mau,
           CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day JOIN mau ON mau.day = dau.day
    """,
    tags=["events", "engagement"],
)
def e_dau_wau_mau(spark, sf_dir):
    """DAU/WAU/MAU engagement rollup with DAU/MAU stickiness: trailing
    7- and 30-day distinct users per day. Each (day, user) row EXPLODES
    into the n anchor days it contributes to (sequence + explode — a
    pure projection with bounded fan-out n), then distinct-counts
    partial-aggregate per anchor: no events-x-events self-join and no
    nested-loop range join anywhere; anchors past the observed range
    drop out in the final equi-join with the DAU frame. At fleet scale
    the sketch path (sk_user_reach_rollup / hll_portable_states)
    replaces the exact distinct; this is the exact twin."""
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = d.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )

    def trailing(n, alias):
        j = d.select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.date_add(F.col("day"), n - 1),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("anchor"),
            "user_id",
        )
        return j.groupBy("anchor").agg(
            F.countDistinct("user_id").cast("bigint").alias(alias)
        )

    wau = trailing(7, "wau").withColumnRenamed("anchor", "day")
    mau = trailing(30, "mau").withColumnRenamed("anchor", "day")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau").cast("double")).alias(
                "stickiness"
            ),
        )
    )
