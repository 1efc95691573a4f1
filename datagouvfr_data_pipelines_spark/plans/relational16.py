"""Catalog batch 16 (round 3): remaining classic plan shapes.

Contents:
- TPC-H shapes expressible without partsupp/commitdate columns: Q4
  (monotone correlated EXISTS rewritten to a max-per-order partial
  aggregate) and Q12 (fact-fact join + conditional-count split);
- join-semantics corners every SQL engine must get right: null-aware
  NOT IN anti-join, null-safe equality join (IS NOT DISTINCT FROM),
  explicit salt-spread skew join, Bloom-pruned semi-join reduction;
- set/grouping machinery: multiset EXCEPT ALL, explicit GROUPING SETS
  with grouping ids, conditional multi-distinct in one Expand pass;
- exact statistics from integer-domain sums (bit-equal to DuckDB):
  Pearson correlation, lag-1 autocorrelation, geometric mean, a
  deterministic-sample AQP estimate with standard error;
- scale patterns: exact mergeable distinct rollup via key bitmaps,
  distributed global row ids (no single-partition window), 2D skyline,
  triangle counting via oriented wedges;
- analytics composites: OHLC downsampling, cohort LTV curves, SCD2
  dwell times, year-over-year brand retention.

Scale notes: every aggregate is partial (map-side combine); broadcast
sides are true dims, salt-replicated dims, or single-row totals;
fact-fact joins shuffle once on their key. Exact cross-engine floats
follow the decimal/HUGEINT-sums + one-identical-IEEE-expression policy
(operators/aggregates.py), with floor-quantization wherever a float
SUM's ordering would otherwise leak in.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from datagouvfr_data_pipelines_spark.operators.aggregates import dsum_product
from datagouvfr_data_pipelines_spark.operators.joins import salted_join
from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "q4_delayed_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS nb_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o.o_orderpriority
    """,
    tags=["tpch-q4", "J8", "semi-join", "correlated-exists"],
)
def q4_delayed_order_priority(spark, sf_dir):
    """TPC-H Q4 shape on available columns: orders having at least one
    line shipped >90 days after the order date, counted per priority.

    The correlated EXISTS predicate is MONOTONE in l_shipdate, so
    "exists a line with l_shipdate > X" rewrites exactly to
    "max(l_shipdate) per order > X" — and the max is a partial
    aggregate: lineitem collapses ~4:1 map-side BEFORE its shuffle,
    where the naive left-semi join would shuffle every line row. One
    reduced shuffle + one equi-join with the date predicate as a
    post-join filter, then the per-priority partial count."""
    o = table(spark, sf_dir, "orders")
    last_ship = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    return (
        o.join(last_ship, o.o_orderkey == last_ship.l_orderkey)
        .where(
            F.col("last_ship")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("nb_orders"))
    )


@register(
    "q12_late_line_priority",
    oracle="""
    SELECT l.l_returnflag,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag
    """,
    tags=["tpch-q12", "A4", "conditional-agg"],
)
def q12_late_line_priority(spark, sf_dir):
    """TPC-H Q12 shape: late-shipped lines split into high- vs low-priority
    counts per return flag. One fact-fact shuffle join on orderkey (orders
    is NOT broadcastable at scale), the late filter rides inside the join,
    and both conditional counts come out of a single partial aggregate."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "j21_null_aware_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS nb_customers
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT NULLIF(o_custkey, -1) FROM orders WHERE o_totalprice > 400000.0
    )
    GROUP BY c_mktsegment
    """,
    tags=["J7", "not-in", "null-aware-anti-join"],
)
def j21_null_aware_anti(spark, sf_dir):
    """NOT IN with a NULLABLE subquery — the three-valued-logic corner a
    plain left-anti join gets wrong: one NULL in the subquery must empty
    the whole result. The NULLIF keeps the subquery column nullable (the
    planner cannot assume non-null), so Spark compiles a null-aware
    anti-join (single-column NOT IN -> NAAJ broadcast hash join) rather
    than a plain anti. The unit test in tests/test_history_and_round3.py
    pins the with-an-actual-NULL behavior; here the runtime set is
    null-free so the query is oracle-comparable and non-empty."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_j21")
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_j21")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS nb_customers
        FROM v_customer_j21
        WHERE c_custkey NOT IN (
          SELECT NULLIF(o_custkey, -1) FROM v_orders_j21
          WHERE o_totalprice > 400000.0
        )
        GROUP BY c_mktsegment
        """
    )


@register(
    "j22_salted_skew_join",
    oracle="""
    SELECT p.p_brand,
           COUNT(*) AS nb_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=["J1", "skew", "salting"],
)
def j22_salted_skew_join(spark, sf_dir):
    """Explicit salt-spread join: the fact side gets a deterministic
    content-hash salt, the dim side is replicated across all 8 salt
    buckets, and the join key becomes (partkey, salt) — so a hot partkey
    lands on 8 tasks instead of 1. Same relational result as the plain
    join (the oracle), different physical distribution; this is the
    fallback for skew AQE cannot split (operators/joins.py:72). Salt
    fan-out cost is bounded: |dim| x 8 rows replicated, never the fact."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    joined = salted_join(li, p, "partkey", salt_buckets=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("nb_lines"),
        dsum_product(
            "l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue"
        ),
    )


@register(
    "u6_multiset_diff",
    oracle="""
    WITH d AS (
      SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
      EXCEPT ALL
      SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'O'
    )
    SELECT surplus, COUNT(*) AS nb_orders
    FROM (SELECT l_orderkey, COUNT(*) AS surplus FROM d GROUP BY 1)
    GROUP BY surplus
    """,
    tags=["U2", "except-all", "multiset"],
)
def u6_multiset_diff(spark, sf_dir):
    """Multiset difference (EXCEPT ALL): per-occurrence subtraction of 'O'
    lines from 'F' lines per order, then a surplus histogram. Unlike
    distinct EXCEPT, each copy counts — Spark's exceptAll compiles to a
    count-tagged aggregate + generate (one shuffle), not a quadratic
    anti-join cascade; both grouped counts that follow are partial."""
    l = table(spark, sf_dir, "lineitem")
    f = l.where(F.col("l_linestatus") == "F").select("l_orderkey")
    o = l.where(F.col("l_linestatus") == "O").select("l_orderkey")
    return (
        f.exceptAll(o)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("surplus"))
        .groupBy("surplus")
        .agg(F.count(F.lit(1)).alias("nb_orders"))
    )


@register(
    "a35_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) * 2
             + CAST(GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS nb,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=["A13", "grouping-sets", "grouping-id"],
)
def a35_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form behind A13's ROLLUP and
    A24's CUBE) with a GROUPING()-derived id that disambiguates real NULL
    keys from subtotal rows — all three granularities in ONE
    partial-aggregated expand pass over the scan, not three scans."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_a35")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) AS INT) * 2
                 + CAST(GROUPING(l_linestatus) AS INT) AS gid,
               COUNT(*) AS nb,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM v_lineitem_a35
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "a36_corr_matrix",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                      AS HUGEINT)) AS sx,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS HUGEINT)) AS sy,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS HUGEINT)) AS sxy,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT)
                 * CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                        AS HUGEINT)) AS sxx,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS HUGEINT)
                 * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS HUGEINT)) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             AS corr_qty_price
    FROM s
    """,
    tags=["A15", "correlation", "hash-exact"],
)
def a36_corr_matrix(spark, sf_dir):
    """Pearson correlation (quantity vs extended price per return flag),
    hash-exact: both measures become exact integer cents, all six
    algebraic sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in
    decimal(38,0)/HUGEINT — exact and overflow-safe where Σy² would
    wrap int64 at sf>=0.1 — and the one IEEE expression
    (num / (sqrt(denx)*sqrt(deny))) is written identically on both
    engines, so doubles match bit-for-bit. Single scan, single shuffle,
    partial aggregation; the scale factors cancel in the ratio. The
    built-in F.corr is the floating-point shortcut when cross-engine
    determinism doesn't matter.

    Hot-path note (round 9): the PER-ROW arithmetic stays in int64 —
    cents fit well under 2^31, so every product fits in 62 bits — and
    only the ACCUMULATOR is decimal(38,0). decimal×decimal in Spark
    routes through java.math.BigDecimal per row (measured ~1.5x this
    query's whole wall at sf0.1); long×long is one codegen multiply.
    Exactness is unchanged: the long products are exact, and the
    decimal(38) sum is where int64 would actually overflow (Σy² wraps
    at sf>=0.1)."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    dec38 = "decimal(38,0)"
    x = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    y = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    # round 12: fan the scan (no-op on wide inputs) — the decimal(38)
    # accumulators dominate, and a narrow scan otherwise runs the whole
    # partial aggregate in one task
    s = (
        fan_out(table(spark, sf_dir, "lineitem"), "l_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast(dec38).alias("n"),
            F.sum(x.cast(dec38)).alias("sx"),
            F.sum(y.cast(dec38)).alias("sy"),
            F.sum((x * y).cast(dec38)).alias("sxy"),
            F.sum((x * x).cast(dec38)).alias("sxx"),
            F.sum((y * y).cast(dec38)).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        (num / (F.sqrt(denx) * F.sqrt(deny))).alias("corr_qty_price"),
    )


@register(
    "sk_bitmap_distinct_rollup",
    oracle="""
    SELECT r.r_name, COUNT(DISTINCT o.o_custkey) AS nb_customers
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
    tags=["A7", "sketch", "bitmap", "mergeable", "rollup"],
)
def sk_bitmap_distinct_rollup(spark, sf_dir):
    """EXACT mergeable distinct counts: COUNT(DISTINCT) does not
    re-aggregate (nation-level distincts cannot sum to region distincts),
    which at 100 TB forces a full rescan per rollup level. Roaring-style
    key bitmaps do re-aggregate: per (nation, bucket) a
    bitmap_construct_agg of the key's bit position (partial, ~KB states),
    then region = bitmap_or_agg of the nation bitmaps (O(groups), no
    rescan), and bitmap_count reads off the EXACT distinct — unlike the
    HLL rollup (sk_user_reach_rollup), which trades exactness for fixed
    state size. One detail-table shuffle total; the oracle is the plain
    one-shot COUNT(DISTINCT)."""
    o = table(spark, sf_dir, "orders").select("o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    e = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    per_nation = e.groupBy(
        "r_name",
        "n_nationkey",
        F.bitmap_bucket_number("o_custkey").alias("bkt"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm")
    )
    per_region = per_nation.groupBy("r_name", "bkt").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    return per_region.groupBy("r_name").agg(
        F.sum(F.bitmap_count("bm")).alias("nb_customers")
    )


@register(
    "w19_ohlc_daily",
    oracle="""
    WITH ordered AS (
      SELECT CAST(ts AS DATE) AS day, value,
             ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events WHERE event_type = 'purchase'
    )
    SELECT day,
           CAST(MIN(CASE WHEN rn_open = 1 THEN value END) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(MIN(CASE WHEN rn_close = 1 THEN value END) AS DOUBLE)
             AS close,
           COUNT(*) AS n_ticks
    FROM ordered GROUP BY day
    """,
    tags=["W2", "timeseries", "downsample", "ohlc"],
)
def w19_ohlc_daily(spark, sf_dir):
    """OHLC downsampling (the classic tick->bar resample): per day, the
    first/last value under the total (ts, event_id) order plus min/max.
    Open/close via min_by/max_by over a struct sort key — ONE partial
    aggregate, no window, no second shuffle (the windowed ROW_NUMBER form
    the oracle uses would sort every partition; min_by is the
    combiner-friendly formulation a 100 TB resample needs)."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@register(
    "p13_global_row_ids",
    oracle="""
    SELECT c_custkey,
           ROW_NUMBER() OVER (ORDER BY c_custkey) AS row_id
    FROM customer
    """,
    tags=["P1", "global-ids", "scale-pattern"],
)
def p13_global_row_ids(spark, sf_dir):
    """Global 1..N ids over the customer key WITHOUT the oracle's
    single-partition window: range shuffle + K-row offset table +
    partition-local numbering (operators/windows.py:global_dense_ids).
    Same answer, but the Spark plan never funnels the table through one
    task — the difference between this and ROW_NUMBER() OVER (ORDER BY)
    is exactly what 100 TB breaks."""
    from datagouvfr_data_pipelines_spark.operators.windows import (
        global_dense_ids,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey")
    return global_dense_ids(c, ["c_custkey"], alias="row_id")


@register(
    "a37_pareto_front",
    oracle="""
    WITH pts AS (
      SELECT DISTINCT p_retailprice, p_size FROM part
    )
    SELECT p_retailprice, p_size FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
    tags=["O6", "skyline", "dominance"],
)
def a37_pareto_front(spark, sf_dir):
    """Pareto front of parts (cheapest price, largest size): the oracle's
    NOT-EXISTS self-join is O(n²); the Spark side is the two-phase
    distributed skyline (partition-local dominance prune, then a global
    pass over the front-sized survivors) — linear scans + one small final
    sort, never all-pairs (operators/windows.py:skyline_2d)."""
    from datagouvfr_data_pipelines_spark.operators.windows import skyline_2d

    p = table(spark, sf_dir, "part")
    return skyline_2d(p, "p_retailprice", "p_size")


@register(
    "a38_autocorr_lag1",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    ), pairs AS (
      SELECT CAST(a.rev AS HUGEINT) AS x, CAST(b.rev AS HUGEINT) AS y
      FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
    ), s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr_lag1
    FROM s
    """,
    tags=["A15", "timeseries", "autocorrelation", "hash-exact"],
)
def a38_autocorr_lag1(spark, sf_dir):
    """Day-over-day autocorrelation of total revenue: daily exact-cent
    totals (ONE partial-agg shuffle over the fact scan), consecutive-day
    pairs via a broadcast self-join of the |days|-sized series (calendar
    adjacency, not sequence position — gap days produce no pair), then
    the a36 exact-sums Pearson kernel in decimal(38,0)/HUGEINT with one
    identical IEEE expression per engine. The fact table is touched
    once; everything after is |days|-scale."""
    dec38 = "decimal(38,0)"
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    daily = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(F.sum(cents).alias("rev"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        F.broadcast(b),
        F.col("b.day") == F.date_add(F.col("a.day"), 1),
    ).select(
        F.col("a.rev").cast(dec38).alias("x"),
        F.col("b.rev").cast(dec38).alias("y"),
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        (num / (F.sqrt(denx) * F.sqrt(deny))).alias("autocorr_lag1"),
    )


@register(
    "j23_null_safe_join",
    oracle="""
    SELECT d.label, COUNT(*) AS nb_customers
    FROM (SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer) c
    LEFT JOIN (VALUES ('AUTOMOBILE', 'auto'), ('FURNITURE', 'furn'),
                      ('MACHINERY', 'mach'), ('HOUSEHOLD', 'house'),
                      (NULL, 'unsegmented')) AS d(seg, label)
      ON c.seg IS NOT DISTINCT FROM d.seg
    GROUP BY d.label
    """,
    tags=["J12", "null-safe-equality", "semantics"],
)
def j23_null_safe_join(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH the dim's NULL row instead of falling out, so the 'unsegmented'
    bucket is populated — plain equality would silently drop every
    NULLIF'd customer. eqNullSafe keys still hash-partition and broadcast
    like ordinary equi-keys (NULL is one more bucket), unlike a filter on
    OR(both null) which would forfeit the hash join."""
    c = table(spark, sf_dir, "customer").withColumn(
        "seg", F.expr("nullif(c_mktsegment, 'BUILDING')")
    )
    d = spark.createDataFrame(
        [
            ("AUTOMOBILE", "auto"),
            ("FURNITURE", "furn"),
            ("MACHINERY", "mach"),
            ("HOUSEHOLD", "house"),
            (None, "unsegmented"),
        ],
        "seg string, label string",
    )
    return (
        c.join(F.broadcast(d), c.seg.eqNullSafe(d.seg), "left")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("nb_customers"))
    )


@register(
    "a39_sampled_revenue",
    oracle="""
    WITH sampled AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem
      WHERE list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(
                CAST(l_orderkey AS VARCHAR) || '-'
                  || CAST(l_linenumber AS VARCHAR), ''),
                c -> CAST(ascii(c) AS BIGINT))),
              (acc, x) -> (acc * 131 + x) % 2147483647) % 50 = 0
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx,
             SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS sxx
      FROM sampled
    )
    SELECT n AS n_sample,
           50 * sx AS est_total_cents,
           50.0 * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1.0)) AS se_total_cents
    FROM s
    """,
    tags=["A3", "aqp", "sampling", "hash-exact"],
)
def a39_sampled_revenue(spark, sf_dir):
    """Approximate query processing: total revenue estimated from a
    DETERMINISTIC 2% hash sample (rolling-hash of the row key mod 50 —
    reproducible in ANSI SQL, so the oracle draws the IDENTICAL sample;
    TABLESAMPLE/rand() could never be cross-engine-checked). Estimate =
    50x the sample sum (exact cents); the standard error comes from the
    exact sample moments through one identical IEEE expression. At 100 TB
    the sample predicate is a map-side filter — the scan is the only
    full-data touch, and a <1% SE answer costs 2% of the aggregate."""
    dec38 = "decimal(38,0)"
    from datagouvfr_data_pipelines_spark.functions.text import (
        fingerprint_rolling,
    )

    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    sampled = (
        table(spark, sf_dir, "lineitem")
        .where(F.pmod(fingerprint_rolling(key), F.lit(50)) == 0)
        .select(cents.alias("cents"))
    )
    s = sampled.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("cents").cast(dec38) * F.col("cents").cast(dec38)).alias(
            "sxx"
        ),
    )
    nd = F.col("n").cast("double")
    se = F.lit(50.0) * F.sqrt(
        (nd * F.col("sxx").cast("double")
         - F.col("sx").cast("double") * F.col("sx").cast("double"))
        / (nd - F.lit(1.0))
    )
    return s.select(
        F.col("n").alias("n_sample"),
        (F.lit(50) * F.col("sx")).alias("est_total_cents"),
        se.alias("se_total_cents"),
    )


@register(
    "a40_conditional_distinct",
    oracle="""
    SELECT n.n_name,
           COUNT(DISTINCT o.o_custkey) AS nb_buyers,
           COUNT(DISTINCT CASE WHEN o.o_totalprice > 200000.0
                               THEN o.o_custkey END) AS nb_big_buyers,
           COUNT(DISTINCT CASE WHEN o.o_orderpriority = '1-URGENT'
                               THEN o.o_custkey END) AS nb_urgent_buyers
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    tags=["A7", "multi-distinct", "conditional"],
)
def a40_conditional_distinct(spark, sf_dir):
    """Several DISTINCT aggregates with different CASE filters in ONE
    grouped pass: Spark compiles multi-distinct into a single Expand
    (one row per distinct-group per input row) + two-level aggregate —
    one shuffle, not one job per distinct. The conditional form
    (DISTINCT CASE WHEN) is the common funnel metric: buyers, big
    buyers, urgent buyers per nation from the same scan."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    big = F.when(F.col("o_totalprice") > 200000.0, F.col("o_custkey"))
    urgent = F.when(
        F.col("o_orderpriority") == "1-URGENT", F.col("o_custkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("nb_buyers"),
            F.countDistinct(big).alias("nb_big_buyers"),
            F.countDistinct(urgent).alias("nb_urgent_buyers"),
        )
    )


@register(
    "g_triangle_count",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), edges AS (
      SELECT DISTINCT a.p_brand AS u, b.p_brand AS v
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    )
    SELECT COUNT(*) AS nb_triangles
    FROM edges e1
    JOIN edges e2 ON e2.u = e1.v
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    tags=["graph", "triangles", "J11"],
)
def g_triangle_count(spark, sf_dir):
    """Triangle count over the brand co-occurrence graph (nodes = brands,
    edge when two brands share an order). Edges are ORIENTED u < v, so
    each triangle is counted exactly once as u < v < w via wedge
    completion: join edges on the shared middle vertex, then verify the
    closing edge — two hash joins on vertex keys, never an open 3-way
    cartesian. At scale the standard refinement (orient by degree) caps
    wedge fan-out at hub nodes; brand-graph degrees are bounded (|brands|)
    so key orientation suffices here."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .select(F.col("a.p_brand").alias("u"), F.col("b.p_brand").alias("v"))
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    wedges = e1.join(e2, F.col("e2.u") == F.col("e1.v"))
    closed = wedges.join(
        e3,
        (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
    )
    return closed.agg(F.count(F.lit(1)).alias("nb_triangles"))


@register(
    "w20_cohort_ltv",
    oracle="""
    WITH cohort AS (
      SELECT o_custkey,
             MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) AS cohort_ym
      FROM orders GROUP BY 1
    ), rev AS (
      SELECT c.cohort_ym,
             (YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate))
               - c.cohort_ym AS age_months,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN cohort c ON c.o_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT cohort_ym, age_months,
           CAST(SUM(cents) OVER (PARTITION BY cohort_ym ORDER BY age_months
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT)
             AS cum_revenue_cents
    FROM rev
    """,
    tags=["W3", "cohort", "ltv", "window"],
)
def w20_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: customers grouped by first-order
    month, revenue accumulated by cohort age. Two partial-agg shuffles on
    o_custkey-sized then (cohort, age)-sized keys; the cumulative window
    runs per cohort over the |cohorts|x|ages| aggregate — bounded frame,
    never fact volume. Exact integer cents end to end (w9_cohort_retention
    counts the same matrix; this weighs it in money)."""
    o = table(spark, sf_dir, "orders")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    cohort = o.groupBy("o_custkey").agg(F.min(ym).alias("cohort_ym"))
    rev = (
        o.select("o_custkey", ym.alias("ym"), cents.alias("cents"))
        .join(cohort, "o_custkey")
        .groupBy(
            "cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias("age_months")
        )
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.select(
        "cohort_ym",
        "age_months",
        F.sum("cents").over(w).alias("cum_revenue_cents"),
    )


@register(
    "a41_geometric_mean",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment,
             CAST(FLOOR(ln(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                AS BIGINT)) * 1000000) AS BIGINT) AS ln_micro
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           exp(CAST(SUM(ln_micro) AS DOUBLE) / 1000000.0
               / CAST(COUNT(*) AS DOUBLE)) / 100.0 AS geo_mean_price
    FROM q GROUP BY c_mktsegment
    """,
    tags=["A2", "geometric-mean", "hash-exact"],
)
def a41_geometric_mean(spark, sf_dir):
    """Geometric mean order value per segment — the right average for
    multiplicative quantities. Log-domain trick made cross-engine
    deterministic: ln runs on exact integer cents (bit-identical), each
    term is floor-quantized to integer micro-nats, the per-group SUM is
    exact integer arithmetic (immune to float summation order), and the
    final exp of one identical double matches bit-for-bit. Single scan,
    one shuffled partial aggregate; quantization bias is a deterministic
    <1e-6 relative factor shared by both engines."""
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    ln_micro = F.floor(F.log(cents) * 1_000_000).cast("long")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", ln_micro.alias("ln_micro")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    nd = F.count(F.lit(1)).cast("double")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.exp(
                    F.sum("ln_micro").cast("double")
                    / F.lit(1_000_000.0)
                    / nd
                )
                / F.lit(100.0)
            ).alias("geo_mean_price"),
        )
    )


@register(
    "j24_bloom_pruned_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS nb_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 400000.0
    GROUP BY o.o_orderpriority
    """,
    tags=["J8", "bloom", "semi-join-reduction"],
)
def j24_bloom_pruned_join(spark, sf_dir):
    """Semi-join reduction: the selective dim filter (top-price orders)
    yields a small key set, so the fact side is Bloom-pruned MAP-SIDE
    (broadcast distinct hash buckets, LeftSemi BHJ) before paying the
    real join's exchange — most lineitem rows never shuffle. False
    positives pass through to the real join, so the result equals the
    plain-join oracle exactly (operators/joins.py:bloom_prune)."""
    from datagouvfr_data_pipelines_spark.operators.joins import bloom_prune

    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_orderpriority")
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    pruned = bloom_prune(l, o, "l_orderkey", "o_orderkey")
    return (
        pruned.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("nb_lines"),
            dsum_product(
                "l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue"
            ),
        )
    )


@register(
    "h2_scd2_dwell_times",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate AS ts, o_orderkey AS tb,
             o_orderstatus AS st
      FROM orders
    ), m AS (
      SELECT o_custkey, ts, tb, st,
             CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
                  WHEN st IS DISTINCT FROM LAG(st) OVER w THEN 1
                  ELSE 0 END AS is_new
      FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, tb)
    ), r AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY o_custkey ORDER BY ts, tb ROWS UNBOUNDED PRECEDING
      ) AS run FROM m
    ), g AS (
      SELECT o_custkey, run, st AS o_orderstatus, MIN(ts) AS valid_from
      FROM r GROUP BY o_custkey, run, st
    ), iv AS (
      SELECT o_orderstatus, valid_from,
             LEAD(valid_from) OVER (
               PARTITION BY o_custkey ORDER BY valid_from, run
             ) AS valid_to
      FROM g
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS nb_closed_intervals,
           CAST(SUM(date_diff('day', CAST(valid_from AS DATE),
                              CAST(valid_to AS DATE))) AS BIGINT)
             AS total_dwell_days
    FROM iv WHERE valid_to IS NOT NULL
    GROUP BY o_orderstatus
    """,
    tags=["history", "scd2", "temporal-agg"],
)
def h2_scd2_dwell_times(spark, sf_dir):
    """Temporal aggregation OVER the SCD2 history: how long customers
    dwell in each order status before transitioning (closed intervals
    only — open ones have no width yet). Composes the h1 derivation with
    integer day arithmetic: the interval layer is |runs|-sized, so the
    dwell rollup costs one small partial aggregate after the history's
    single keyed window shuffle."""
    from datagouvfr_data_pipelines_spark.operators.history import scd2_history

    iv = scd2_history(
        table(spark, sf_dir, "orders"),
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    )
    return (
        iv.where(F.col("valid_to").isNotNull())
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("nb_closed_intervals"),
            F.sum(
                F.datediff(F.to_date("valid_to"), F.to_date("valid_from"))
            ).alias("total_dwell_days"),
        )
    )


@register(
    "j25_repeat_brand_rate",
    oracle="""
    WITH by_year AS (
      SELECT DISTINCT o.o_custkey, p.p_brand,
             YEAR(o.o_orderdate) AS yr
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
    ), base AS (
      SELECT a.p_brand,
             CAST(COUNT(*) AS BIGINT) AS nb_buyers,
             CAST(SUM(CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb_repeat
      FROM by_year a
      LEFT JOIN by_year b
        ON b.o_custkey = a.o_custkey AND b.p_brand = a.p_brand
       AND b.yr = a.yr + 1
      WHERE a.yr = 1996
      GROUP BY a.p_brand
    )
    SELECT p_brand, nb_buyers, nb_repeat,
           CAST(nb_repeat AS DOUBLE) / CAST(nb_buyers AS DOUBLE)
             AS repeat_rate
    FROM base
    """,
    tags=["J5", "retention", "repeat-purchase"],
)
def j25_repeat_brand_rate(spark, sf_dir):
    """Year-over-year brand retention: of 1996's buyers per brand, the
    share who bought the same brand again in 1997. One distinct
    (customer, brand, year) projection feeds both join sides — the year
    filters prune each side BEFORE the (custkey, brand) shuffle, so the
    join input is buyer-sized, not lineitem-sized; the rate is one IEEE
    division of exact counts."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    by_year = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("o_custkey", "p_brand", "yr")
        .distinct()
    )
    a = by_year.where(F.col("yr") == 1996).alias("a")
    b = by_year.where(F.col("yr") == 1997).alias("b")
    joined = a.join(
        b,
        (F.col("b.o_custkey") == F.col("a.o_custkey"))
        & (F.col("b.p_brand") == F.col("a.p_brand")),
        "left",
    )
    base = joined.groupBy(F.col("a.p_brand").alias("p_brand")).agg(
        F.count(F.lit(1)).alias("nb_buyers"),
        F.sum(
            F.when(F.col("b.o_custkey").isNotNull(), 1).otherwise(0)
        ).alias("nb_repeat"),
    )
    return base.select(
        "p_brand",
        "nb_buyers",
        "nb_repeat",
        (
            F.col("nb_repeat").cast("double")
            / F.col("nb_buyers").cast("double")
        ).alias("repeat_rate"),
    )


@register(
    "x1_cuped_adjusted_lift",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(CAST(c.c_custkey AS VARCHAR), ''),
                              ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 2147483647) % 2 AS variant,
             COALESCE(SUM(CASE WHEN YEAR(o.o_orderdate) = 1996
               THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) END), 0) AS x,
             COALESCE(SUM(CASE WHEN YEAR(o.o_orderdate) = 1997
               THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) END), 0) AS y
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ), g AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
      FROM per_cust
    ), v AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(x) AS BIGINT) AS vsx, CAST(SUM(y) AS BIGINT) AS vsy
      FROM per_cust GROUP BY 1
    )
    SELECT v.variant, v.n_units,
           CAST(v.vsy AS DOUBLE) / CAST(v.n_units AS DOUBLE) / 100.0
             AS mean_spend,
           (CAST(v.vsy AS DOUBLE) / CAST(v.n_units AS DOUBLE)
            - (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
               / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
              * (CAST(v.vsx AS DOUBLE) / CAST(v.n_units AS DOUBLE)
                 - CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))) / 100.0
             AS mean_spend_cuped
    FROM v, g
    """,
    tags=["experiment", "cuped", "variance-reduction", "hash-exact"],
)
def x1_cuped_adjusted_lift(spark, sf_dir):
    """CUPED-adjusted experiment readout (public method: Deng, Xu,
    Kohavi, Walker 2013 — controlled-experiment variance reduction using
    pre-experiment data): per-customer 1997 spend adjusted by 1996 spend,
    theta = cov(x,y)/var(x) pooled over all units, variant = hash split.
    Per-variant adjusted mean = ybar_v - theta (xbar_v - xbar). All
    moments are exact integer sums (decimal(38)/HUGEINT) and every float
    step is one identical IEEE expression per engine — adjusted means
    match DuckDB bit-for-bit. Shape: one shuffle to per-customer
    (16-byte) tuples, then two tiny aggregates; the 1-row global-moments
    frame broadcasts onto the 2-row variant frame."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        fingerprint_rolling,
    )

    dec38 = "decimal(38,0)"
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    yr = F.year("o_orderdate")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(yr == 1996, cents).alias("x96"),
        F.when(yr == 1997, cents).alias("y97"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.sum("x96"), F.lit(0)).alias("x"),
            F.coalesce(F.sum("y97"), F.lit(0)).alias("y"),
        )
        .withColumn(
            "variant",
            F.pmod(
                fingerprint_rolling(F.col("c_custkey").cast("string")),
                F.lit(2),
            ),
        )
    )
    g = per_cust.agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        F.sum(F.col("x").cast(dec38) * F.col("y").cast(dec38)).alias("sxy"),
        F.sum(F.col("x").cast(dec38) * F.col("x").cast(dec38)).alias("sxx"),
    )
    v = per_cust.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("x").alias("vsx"),
        F.sum("y").alias("vsy"),
    )
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ybar_v = F.col("vsy").cast("double") / F.col("n_units").cast("double")
    xbar_v = F.col("vsx").cast("double") / F.col("n_units").cast("double")
    xbar_g = F.col("sx").cast("double") / F.col("n").cast("double")
    return v.crossJoin(F.broadcast(g)).select(
        F.col("variant").cast("long").alias("variant"),
        "n_units",
        (ybar_v / F.lit(100.0)).alias("mean_spend"),
        ((ybar_v - theta * (xbar_v - xbar_g)) / F.lit(100.0)).alias(
            "mean_spend_cuped"
        ),
    )


@register(
    "ts1_seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    ), scored AS (
      SELECT a.day, a.rev, b.rev AS forecast,
             ABS(a.rev - b.rev) AS abs_err
      FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 7 DAY
      WHERE a.day >= DATE '1998-01-01'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(abs_err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
             AS mae,
           CAST(SUM(abs_err) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE) AS wape
    FROM scored
    """,
    tags=["timeseries", "forecast", "backtest", "hash-exact"],
)
def ts1_seasonal_naive_backtest(spark, sf_dir):
    """Forecast backtesting: the seasonal-naive baseline (predict each
    1998 day with the value 7 days earlier) scored by MAE and WAPE. The
    model every real forecast must beat — and the harness pattern
    (lag-join + exact integer error sums + one IEEE division) is the
    same for any model. Fact scan aggregates once; the lag join and
    scoring run on the |days| frame."""
    daily = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            ).alias("rev")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    scored = (
        a.join(
            F.broadcast(b),
            F.col("a.day") == F.date_add(F.col("b.day"), 7),
        )
        .where(F.col("a.day") >= F.lit("1998-01-01").cast("date"))
        .select(
            F.col("a.rev").alias("rev"),
            F.abs(F.col("a.rev") - F.col("b.rev")).alias("abs_err"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.sum("abs_err").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("mae"),
        (F.sum("abs_err").cast("double") / F.sum("rev").cast("double")).alias(
            "wape"
        ),
    )


@register(
    "sk_topk_rollup",
    oracle="""
    WITH ranked AS (
      SELECT n.n_name, c.c_custkey, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey)
               AS rk
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT n_name, c_custkey, c_acctbal
    FROM ranked WHERE rk <= 3
    """,
    tags=["sketch", "topk", "mergeable"],
)
def sk_topk_rollup(spark, sf_dir):
    """Top-3 customers by balance per nation, computed as MERGED
    per-batch top-k states (customers split into 4 disjoint hash
    batches, each reduced to its local k-best, then union + one re-rank
    over the 4k-per-group candidates) — proving the state form equals
    the oracle's direct single-window answer. This is how an interactive
    session maintains a leaderboard across arriving batches without
    rescanning (operators/sketches.py:topk_state/topk_merge)."""
    from datagouvfr_data_pipelines_spark.operators.sketches import (
        topk_merge,
        topk_state,
    )

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name", "c_custkey", "c_acctbal"
    )
    batches = [
        base.where(F.pmod(F.col("c_custkey"), F.lit(4)) == i)
        for i in range(4)
    ]
    states = [
        topk_state(b, ["n_name"], "c_acctbal", "c_custkey", 3)
        for b in batches
    ]
    return topk_merge(states, ["n_name"], "c_acctbal", "c_custkey", 3)


@register(
    "arr1_brand_overlap_arrays",
    oracle="""
    WITH by_year AS (
      SELECT o.o_custkey,
             list_sort(list_distinct(list(p.p_brand) FILTER (
               WHERE YEAR(o.o_orderdate) = 1996))) AS b96,
             list_sort(list_distinct(list(p.p_brand) FILTER (
               WHERE YEAR(o.o_orderdate) = 1997))) AS b97
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE YEAR(o.o_orderdate) IN (1996, 1997)
      GROUP BY 1
    )
    SELECT CAST(COALESCE(len(list_intersect(b96, b97)), 0) AS INTEGER)
             AS nb_shared,
           CAST(COUNT(*) AS BIGINT) AS nb_customers
    FROM by_year
    GROUP BY 1
    """,
    tags=["scalar-array", "set-ops", "A17"],
)
def arr1_brand_overlap_arrays(spark, sf_dir):
    """Per-row array set algebra (§2.8 array family): each customer's
    1996 and 1997 brand sets collected in ONE conditional collect_set
    pass, intersected per row with array_intersect (JVM-side, no
    explode-and-rejoin), histogrammed by overlap size. Collected sets
    are basket-bounded, so per-row state stays small at any scale."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    by_year = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("yr").isin(1996, 1997))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("o_custkey")
        .agg(
            F.sort_array(
                F.collect_set(F.when(F.col("yr") == 1996, F.col("p_brand")))
            ).alias("b96"),
            F.sort_array(
                F.collect_set(F.when(F.col("yr") == 1997, F.col("p_brand")))
            ).alias("b97"),
        )
    )
    return (
        by_year.select(
            F.size(F.array_intersect("b96", "b97")).alias("nb_shared")
        )
        .groupBy("nb_shared")
        .agg(F.count(F.lit(1)).alias("nb_customers"))
    )


@register(
    "w21_rolling_median_7d",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    )
    SELECT day,
           quantile_cont(rev, 0.5) OVER (
             ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                    AND CURRENT ROW
           ) / 100.0 AS rolling_median
    FROM daily
    """,
    tags=["W6", "rolling-median", "window", "exact-percentile"],
)
def w21_rolling_median_7d(spark, sf_dir):
    """Trailing-7-day rolling EXACT median of daily revenue: percentile
    as a window aggregate over an event-time RANGE frame (epoch-day
    keyed, so calendar gaps shrink the window rather than stretching
    it). The window runs over the |days|-sized daily aggregate — global
    order is intentional and bounded (the fact table partial-aggregates
    first); integer-cent inputs make the 0.5 interpolation midpoint
    bit-equal to DuckDB's quantile_cont."""
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    daily = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(F.sum(cents).alias("rev"))
        .withColumn("epoch_day", F.datediff("day", F.lit("1970-01-01")))
    )
    w = Window.orderBy("epoch_day").rangeBetween(-6, 0)
    return daily.select(
        "day",
        (F.percentile("rev", F.lit(0.5)).over(w) / F.lit(100.0)).alias(
            "rolling_median"
        ),
    )


@register(
    "a42_percentile_bands",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT), 0.10) / 100.0 AS p10,
           quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT), 0.50) / 100.0 AS p50,
           quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT), 0.90) / 100.0 AS p90
    FROM orders GROUP BY 1
    """,
    tags=["A2", "percentile-bands", "exact-percentile"],
)
def a42_percentile_bands(spark, sf_dir):
    """Monthly P10/P50/P90 bands of order value — the dashboard staple —
    via ONE array-percentile aggregate per group (a single sort of each
    group's values serves all three cut points, not three passes).
    Integer-cent inputs make the linear interpolation bit-equal to
    DuckDB's quantile_cont; swap to percentile_approx at the 100 TB tier
    (documented trade, SURVEY §4 rule 1)."""
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    bands = F.percentile(
        cents, F.array(F.lit(0.10), F.lit(0.50), F.lit(0.90))
    )
    return (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("month")
        )
        .agg(bands.alias("b"))
        .select(
            "month",
            (F.col("b")[0] / 100.0).alias("p10"),
            (F.col("b")[1] / 100.0).alias("p50"),
            (F.col("b")[2] / 100.0).alias("p90"),
        )
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM POLISHED%'
      AND p.p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_size
    """,
    tags=["tpch-q16", "A7", "dim-exclusion"],
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape on available columns (lineitem stands in for the
    absent partsupp): distinct suppliers per (brand, size) with the
    classic negated dim predicates. The exclusions prune the BROADCAST
    dim before the join, so the fact side pays one (brand, size,
    suppkey) dedup shuffle + a counting partial aggregate — the
    Expand-free single-distinct path."""
    p = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#45")
            & ~F.col("p_type").startswith("MEDIUM POLISHED")
            & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q2_min_price_supplier",
    oracle="""
    WITH quotes AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS quote_cents
      FROM lineitem l GROUP BY 1, 2
    ), ranked AS (
      SELECT p.p_partkey, p.p_brand, q.l_suppkey, q.quote_cents,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY q.quote_cents, q.l_suppkey) AS rk
      FROM quotes q JOIN part p ON p.p_partkey = q.l_partkey
      WHERE p.p_size = 9
    )
    SELECT r.p_partkey, r.p_brand, s.s_name,
           r.quote_cents / 100.0 AS best_quote
    FROM ranked r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rk = 1
    """,
    tags=["tpch-q2", "A11", "argmin"],
)
def q2_min_price_supplier(spark, sf_dir):
    """TPC-H Q2 shape (lineitem quotes stand in for the absent
    partsupp): per size-9 part, the supplier with the lowest observed
    price, supplier-key tie-break. Spark side skips the oracle's rank
    window entirely: min_by over a (quote, suppkey) struct makes the
    argmin a PARTIAL aggregate — two combiner-friendly groupBys and two
    broadcast dim joins, no per-part sort."""
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    quotes = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(cents).alias("quote_cents"))
    )
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_size") == 9)
        .select("p_partkey", "p_brand")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    key = F.struct(F.col("quote_cents"), F.col("l_suppkey"))
    best = (
        quotes.join(F.broadcast(p), quotes.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.min_by("l_suppkey", key).alias("l_suppkey"),
            F.min("quote_cents").alias("quote_cents"),
        )
    )
    return best.join(
        F.broadcast(s), best.l_suppkey == s.s_suppkey
    ).select(
        "p_partkey",
        "p_brand",
        "s_name",
        (F.col("quote_cents") / 100.0).alias("best_quote"),
    )


@register(
    "d2_dup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT sha256(lower(trim(
             regexp_replace(text, '\\s+', ' ', 'g'))))) AS BIGINT)
             AS n_unique,
           1.0 - CAST(COUNT(DISTINCT sha256(lower(trim(
             regexp_replace(text, '\\s+', ' ', 'g'))))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS dup_rate
    FROM documents
    GROUP BY source
    """,
    tags=["llm-pipeline", "dedup", "reporting"],
)
def d2_dup_rate_by_source(spark, sf_dir):
    """Curation triage report: exact-duplicate rate per ingest source
    (the reference's 4-8%-dups-per-DVF-file observation generalized,
    SURVEY §6) — tells the pipeline WHICH feeds need dedup attention
    before any expensive near-dup tier runs. One grouped
    distinct-count over the normalized content hash."""
    from datagouvfr_data_pipelines_spark.operators.dedup import content_hash

    docs = table(spark, sf_dir, "documents")
    out = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(content_hash("text")).alias("n_unique"),
    )
    return out.select(
        "source",
        "n_docs",
        "n_unique",
        (
            F.lit(1.0)
            - F.col("n_unique").cast("double") / F.col("n_docs").cast("double")
        ).alias("dup_rate"),
    )


@register(
    "x2_srm_check",
    oracle="""
    WITH v AS (
      SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(CAST(c_custkey AS VARCHAR), ''),
                              ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 2147483647) % 2 AS variant
      FROM customer
    ), s AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM v
    )
    SELECT n0, n1,
           CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
             / CAST(n0 + n1 AS DOUBLE) AS chi2,
           CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
             / CAST(n0 + n1 AS DOUBLE) > 3.841 AS srm_flag
    FROM s
    """,
    tags=["experiment", "srm", "quality-gate"],
)
def x2_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch gate for the x1 experiment split: chi-square
    against the intended 50/50 allocation (1 dof critical value 3.841 at
    p=0.05). A flagged SRM means the assignment itself is broken and any
    readout is invalid — the standard first check of experiment QA.
    Exact integer counts, one identical IEEE expression; single partial
    aggregate over the unit universe."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        fingerprint_rolling,
    )

    variant = F.pmod(
        fingerprint_rolling(F.col("c_custkey").cast("string")), F.lit(2)
    )
    s = (
        table(spark, sf_dir, "customer")
        .select(variant.alias("variant"))
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
        )
    )
    chi2 = (
        (F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))
    ).cast("double") / (F.col("n0") + F.col("n1")).cast("double")
    return s.select(
        "n0", "n1", chi2.alias("chi2"), (chi2 > 3.841).alias("srm_flag")
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100
                      ) AS BIGINT) AS q_cents
      FROM lineitem WHERE YEAR(l_shipdate) = 1996
      GROUP BY 1, 2
    ), per_p AS (
      SELECT l_partkey, CAST(SUM(q_cents) AS BIGINT) AS total_cents,
             CAST(COUNT(*) AS BIGINT) AS n_supps
      FROM per_ps GROUP BY 1
    )
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS nb_dominated_parts
    FROM per_ps ps
    JOIN per_p p ON p.l_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE p.n_supps >= 2 AND 2 * ps.q_cents > p.total_cents
    GROUP BY s.s_name
    """,
    tags=["tpch-q20", "J8", "share-threshold"],
)
def q20_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 spirit on available columns: suppliers carrying the
    MAJORITY of a multi-supplier part's 1996 shipped volume, counted per
    supplier. The share predicate is integer arithmetic (2*q > total) on
    exact centi-quantities — no division, no float. Both aggregates ride
    the same (partkey) shuffle key: the year filter pushes to the scan,
    per-(part,supp) partials collapse map-side, and the per-part total
    re-aggregates FROM the grouped frame (no second scan)."""
    q_cents = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    per_ps = (
        table(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1996)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(q_cents).alias("q_cents"))
    )
    per_p = per_ps.groupBy("l_partkey").agg(
        F.sum("q_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_supps"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_ps.join(per_p, "l_partkey")
        .where(
            (F.col("n_supps") >= 2)
            & (F.lit(2) * F.col("q_cents") > F.col("total_cents"))
        )
        .join(F.broadcast(s), per_ps.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("nb_dominated_parts"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT n.n_name, l.l_partkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                      ) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2
    ), nt AS (
      SELECT n_name, CAST(SUM(value_cents) AS BIGINT) AS nation_cents
      FROM pv GROUP BY 1
    )
    SELECT pv.n_name,
           CAST(COUNT(*) AS BIGINT) AS nb_important_parts,
           CAST(SUM(pv.value_cents) AS BIGINT) AS important_cents
    FROM pv JOIN nt ON nt.n_name = pv.n_name
    WHERE 1000 * pv.value_cents > nt.nation_cents
    GROUP BY pv.n_name
    """,
    tags=["tpch-q11", "A10", "share-threshold"],
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (shipped value stands in for the absent partsupp
    stock value): parts whose value exceeds 0.1% of their supplier
    nation's total, counted and summed per nation. Same integer
    no-division share predicate as q20 (1000*part > nation); the nation
    totals re-aggregate from the grouped frame and broadcast back onto
    it — the fact table is scanned and shuffled once."""
    v_cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", v_cents.alias("v")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.sum("v").alias("value_cents"))
    )
    nt = pv.groupBy("n_name").agg(F.sum("value_cents").alias("nation_cents"))
    return (
        pv.join(F.broadcast(nt), "n_name")
        .where(F.lit(1000) * F.col("value_cents") > F.col("nation_cents"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("nb_important_parts"),
            F.sum("value_cents").alias("important_cents"),
        )
    )


@register(
    "w24_hourly_seasonality",
    oracle="""
    WITH base AS (
      SELECT isodow(ts) AS dow, CAST(hour(ts) AS INTEGER) AS hr
      FROM events
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base)
    SELECT CAST(dow AS INTEGER) AS dow, hr,
           CAST(COUNT(*) AS BIGINT) AS nb_events,
           CAST(COUNT(*) AS DOUBLE) / CAST(tot.n AS DOUBLE) AS share
    FROM base, tot
    GROUP BY dow, hr, tot.n
    """,
    tags=["A4", "seasonality", "calendar"],
)
def w24_hourly_seasonality(spark, sf_dir):
    """Activity seasonality profile: the (ISO weekday x hour) event
    matrix with each cell's share of total traffic — the load-shaping
    input for batch scheduling. ISO weekday (Monday=1) is the portable
    encoding: Spark's dayofweek is Sunday-based, DuckDB's dow differs
    again, so both sides compute the ISO form. One partial-agg shuffle;
    the grand total broadcasts."""
    ev = table(spark, sf_dir, "events").select(
        F.expr("weekday(ts) + 1").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    return (
        ev.groupBy("dow", "hr")
        .agg(F.count(F.lit(1)).alias("nb_events"))
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hr",
            "nb_events",
            (
                F.col("nb_events").cast("double") / F.col("n").cast("double")
            ).alias("share"),
        )
    )


@register(
    "scalar_month_end_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
             AS plus_1m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE)
             AS quarter_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                last_day(CAST(o_orderdate AS DATE))) AS INTEGER)
             AS days_to_month_end
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=["scalar-date", "month-end", "calendar"],
)
def scalar_month_end_arith(spark, sf_dir):
    """Month-end calendar arithmetic corners (§2.8 date family): +1 month
    CLAMPS at short months (Jan 31 -> Feb 28/29 on both engines —
    pinned here because engines have historically disagreed), last_day,
    quarter truncation, and days-remaining-in-month. Pure projection;
    the key filter pushes to the scan."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 1).alias("plus_1m"),
        F.last_day(d).alias("month_end"),
        F.to_date(F.date_trunc("quarter", "o_orderdate")).alias(
            "quarter_start"
        ),
        F.datediff(F.last_day(d), d).cast("int").alias("days_to_month_end"),
    )
