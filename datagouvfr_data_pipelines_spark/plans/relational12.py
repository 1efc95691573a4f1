"""Catalog batch 12 (round 3): the rest of the classic OLAP flagship set,
adapted to the star-schema subset available in the test data (no partsupp /
commitdate / phone columns — each query keeps the REFERENCE SHAPE of its
TPC-H counterpart on the columns that exist).

These widen the engine's proof beyond per-operator checks: multi-join
pipelines, conditional-share ratios, scalar-subquery thresholds, two-level
aggregations, EXISTS/NOT-EXISTS self-join logic, and HAVING filters — each
with a DuckDB oracle at bit parity (decimal-exact sums, single IEEE
divisions, total-order-deterministic limits).

Scale notes: every plan broadcasts filtered dims, shuffles facts at most
once per join key, and keeps aggregates partial (map-side combine). The
only self-joins (q21 shape) are key-bounded per order — never quadratic in
the table.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.aggregates import (
    davg,
    dsum,
    dsum_product,
)
from datagouvfr_data_pipelines_spark.plans.catalog import register, table

_DEC = "decimal(18,2)"


def _rev() -> F.Column:
    """Decimal-exact revenue term l_extendedprice * (1 - l_discount)."""
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS nb_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=["flagship", "tpch-q6", "A3", "P3"],
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + conjunctive filter + single aggregate.
    Every predicate pushes to the parquet scan (date + discount + quantity
    are all plain comparisons); no shuffle at all beyond the final
    single-row reduce. The what-if revenue measure is a decimal-exact
    sum of products."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_product("l_extendedprice", "l_discount", "revenue"),
            F.count(F.lit(1)).alias("nb_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    GROUP BY n1.n_name, n2.n_name, ship_year
    """,
    tags=["flagship", "tpch-q7", "J1", "A3"],
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. supplier+nation and customer+nation both broadcast (filtered to
    the two nations BEFORE the join, so the disjunctive pair condition is
    a cheap post-broadcast filter); the single fact shuffle is
    lineitem ⋈ orders on orderkey."""
    n = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(dsum_product("l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
    )
    SELECT order_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY order_year
    """,
    tags=["flagship", "tpch-q8", "J1", "A3", "A10"],
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of regional volume per order
    year. All five dims broadcast; lineitem ⋈ orders is the only fact
    shuffle. The share is ONE IEEE division of two decimal-exact sums —
    bit-identical across engines and across any partial-agg order."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n = table(spark, sf_dir, "nation")
    cn = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    li = table(spark, sf_dir, "lineitem")
    vol = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(_DEC)
    return vol.groupBy("order_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=["flagship", "tpch-q10", "J1", "A3", "A9"],
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: customers who returned the most revenue in a
    six-month window. Customer and nation broadcast; the fact shuffle is
    lineitem ⋈ orders; the limit is a TakeOrdered with a custkey
    tie-break so the top-20 is total-order deterministic."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cd = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey", "c_name", "n_name", "c_acctbal"
    )
    return (
        li.join(o.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cd), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum_product("l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    tags=["flagship", "tpch-q13", "J2", "A14"],
)
def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: the distribution of per-customer order counts —
    a LEFT join (zero-order customers must survive) feeding TWO
    aggregation levels. The join predicate filters orders BEFORE the
    join; count(o_orderkey) counts only matched rows. Second-level
    distribution is tiny (|distinct counts| rows), so the re-agg
    shuffle is negligible."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 AS DOUBLE)
           * (CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                            THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                 * CAST(1 - l.l_discount AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
              / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE))
             AS promo_share_pct,
           COUNT(*) AS nb_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    tags=["flagship", "tpch-q14", "J1", "A4", "A10"],
)
def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue as a percentage of one month's
    total. Part broadcasts onto the date-pruned lineitem scan; the
    answer is one conditional decimal sum over the same pass as the
    total — a single-row result with a deterministic 100*(a/b)
    double expression (same op order on both engines)."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    zero = F.lit(0).cast(_DEC)
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * (
                F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
                ).cast("double")
                / F.sum(_rev()).cast("double")
            )
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("nb_lines"),
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=["flagship", "tpch-q15", "A9", "J5"],
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — an aggregate joined against the max OF that aggregate.
    The per-supplier revenue table is tiny (|suppliers| rows), so the
    max is a 1-row broadcast equi-join back onto it, not a global sort.
    Revenue equality is safe: both sides are the same decimal-exact sum
    cast once to double."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_product("l_extendedprice", F.lit(1) - F.col("l_discount"), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH agg AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(l_quantity)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           COUNT(*) AS nb_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
    JOIN agg a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.qty_threshold
    """,
    tags=["flagship", "tpch-q17", "J5", "A2", "A3"],
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost to small-quantity orders — each line
    compared against 0.2x its part's average quantity (a scalar-per-group
    subquery). The per-part averages are |parts| rows, broadcast back
    onto the brand-filtered fact scan; threshold arithmetic is
    double-deterministic (decimal-exact sum / count, one multiply)."""
    li = table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg("l_quantity", "avg_qty")).alias("qty_threshold")
    )
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    t = thresholds.withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum("l_extendedprice", "s") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("nb_lines"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=["flagship", "tpch-q18", "J5", "A3", "A9"],
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity clears a HAVING
    threshold, enriched with customer and ranked by price. The heavy
    step is one partial-aggregated groupBy on orderkey; survivors are
    rare (HAVING > 300), so both enrich joins broadcast the SURVIVOR
    side against the dimension scans. l_quantity sums are integral
    doubles (exact), so the threshold and output bits agree across
    engines."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS nb_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
    tags=["flagship", "tpch-q19", "J1", "P3"],
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs disjunctive predicate spanning both
    join sides. The part side pre-filters to the union of brand/size
    windows (a derivable implied predicate that shrinks the broadcast),
    and the full disjunction applies after the broadcast join — one
    fact scan, no shuffle."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (
            (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
        )
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            dsum_product("l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("nb_lines"),
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R' AND o.o_orderstatus = 'F'
    ),
    supp_per_order AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS ns
      FROM lineitem GROUP BY l_orderkey
    ),
    r_supp_per_order AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS nr
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM pairs pr
    JOIN supp_per_order so ON so.l_orderkey = pr.l_orderkey AND so.ns >= 2
    JOIN r_supp_per_order ro ON ro.l_orderkey = pr.l_orderkey AND ro.nr = 1
    JOIN supplier s ON s.s_suppkey = pr.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    tags=["flagship", "tpch-q21", "J7", "J8", "A7"],
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers solely responsible for returned lines on
    finalized multi-supplier orders (EXISTS another supplier on the order,
    NOT EXISTS another supplier with a returned line). Both correlated
    EXISTS become per-order distinct-supplier counts — two key-bounded
    aggregates on the same orderkey shuffle, never a quadratic self-join.
    Top-10 with a name tie-break is total-order deterministic.

    Round-9 formulation audit (10x sf0.1, 64k row groups, median of 5):
    this collect_set form 3.7 s; a two-level plain-agg rewrite
    (groupBy(orderkey, suppkey) then groupBy(orderkey) counts — no object
    agg, no countDistinct expand) 4.2 s, because the second full shuffle
    costs more than the set states save. Keeping the measured best."""
    li = table(spark, sf_dir, "lineitem")
    o_f = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    # ONE lineitem scan, ONE shuffle: collect per-order distinct supplier
    # sets (all suppliers, and suppliers with a returned line) in a single
    # groupBy(l_orderkey) with map-side partial collect_set. Both correlated
    # EXISTS become size() predicates; the lone culpable supplier is the
    # singleton element of the R-set. Set sizes are bounded by basket size,
    # so state per key is a small constant at any scale. The orders filter
    # joins on the groupBy's own partitioning (co-located, no re-shuffle).
    # Round 12: fan the scan on the orderkey first (the j18 pattern) — the
    # exchange doubles as the groupBy shuffle and the per-order set build
    # runs at cluster width instead of inside a single narrow scan task.
    from datagouvfr_data_pipelines_spark.session import fan_out

    li = fan_out(li.select("l_orderkey", "l_suppkey", "l_returnflag"), "l_orderkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("all_s"),
        F.collect_set(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("r_s"),
    )
    culprits = (
        per_order.where((F.size("all_s") >= 2) & (F.size("r_s") == 1))
        .join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("r_s")[0].alias("l_suppkey"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        culprits.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH cutoff AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(c_acctbal) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_mktsegment
    """,
    tags=["flagship", "tpch-q22", "J7", "A3"],
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, counted per segment. The positive-balance average is a 1-row
    broadcast (scalar subquery); recency is a LEFT ANTI join against the
    date-pruned orders scan — the anti side shrinks before it shuffles."""
    c = table(spark, sf_dir, "customer")
    cutoff = c.where(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(cutoff)).where(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal", "totacctbal"),
    )
