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
    generation is linear in orders at any scale."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    brands = (
        l.select("l_orderkey", "l_partkey")
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
    "geo_nearest_join",
    oracle=f"""
    WITH pts AS (
      SELECT event_id AS station_id, lon, lat,
             CAST(FLOOR(lon / 10) AS BIGINT) AS cx,
             CAST(FLOOR(lat / 10) AS BIGINT) AS cy
      FROM (SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat
            FROM events WHERE event_type = 'signup')
    ),
    pr AS (
      SELECT event_id, lon, lat,
             CAST(FLOOR(lon / 10) AS BIGINT) AS cx,
             CAST(FLOOR(lat / 10) AS BIGINT) AS cy
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
    same plan shape."""
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
        pr, pts, probe_id="event_id", point_id="station_id", cell_size=10.0
    )
