"""Catalog batch 14 (round 3): embedding-pipeline completion — int8
vector quantization for serving and contrastive triplet generation for
representation training. Both oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "emb_int8_quantize",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(x))) AS amax
      FROM embeddings
    )
    SELECT vec_id, i - 1 AS dim,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                      * (127.0 / CAST(amax AS DOUBLE))) AS BIGINT) AS q
    FROM base, (SELECT UNNEST(range(1, 65)) AS i)
    WHERE amax > 0 AND vec_id < 200
    """,
    tags=["embedding", "quantization", "serving"],
)
def emb_int8_quantize(spark, sf_dir):
    """Symmetric int8 vector quantization (the standard serving
    compression: 4x smaller scans, SIMD int dot products): per vector,
    scale = 127/max|x|, q_i = floor(x_i * scale). max-abs is a SELECTION
    over floats (bit-stable), the scale/product/floor chain is identical
    double arithmetic on both engines — so even quantized codes are
    hash-exact. Shuffle-free: one projection + posexplode; at 100 TB the
    quantized table is what the ANN tier scans. Output exploded to
    (vec_id, dim, q) scalar rows (driver-canonicalizable)."""
    emb = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    base = emb.select("vec_id", "embedding", amax.alias("amax")).where(
        F.col("amax") > 0
    )
    scale = F.lit(127.0) / F.col("amax").cast("double")
    return base.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * scale).cast("bigint"),
            )
        ).alias("dim", "q"),
    )


@register(
    "a32_weighted_median",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag, l_extendedprice AS v,
             SUM(CAST(l_quantity AS BIGINT)) AS wt
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, v,
             SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cumw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS totw
      FROM agg
    )
    SELECT l_returnflag, MIN(v) AS weighted_median
    FROM c WHERE 2 * cumw >= totw GROUP BY l_returnflag
    """,
    tags=["A2", "weighted-median", "window"],
)
def a32_weighted_median(spark, sf_dir):
    """Exact weighted median (price weighted by quantity) per group: the
    first value whose cumulative integer weight crosses half the total —
    pure BIGINT comparisons over a value-ordered cumulative window, so
    the answer is a SELECTED input value, bit-portable by construction.
    Distinct values pre-aggregate first (the cumulative window sees
    |distinct values| rows, not fact volume)."""
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("wt"))
    wp = W.partitionBy("l_returnflag")
    wc = wp.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = agg.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(wc).alias("cumw"),
        F.sum("wt").over(wp).alias("totw"),
    )
    return (
        c.where(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(F.min("v").alias("weighted_median"))
    )


@register(
    "a33_mode_per_group",
    oracle="""
    WITH cnt AS (
      SELECT l_returnflag, l_quantity AS v, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    r AS (
      SELECT l_returnflag, v, n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, v) AS rk
      FROM cnt
    )
    SELECT l_returnflag, v AS mode_qty, n AS n_occurrences
    FROM r WHERE rk = 1
    """,
    tags=["A6", "mode", "window"],
)
def a33_mode_per_group(spark, sf_dir):
    """Per-group mode with a deterministic tie-break (count DESC, value
    ASC): one partial-aggregated value count, then a rank window over the
    tiny |distinct values| table — never a collect-and-scan. The
    engine-native statistical mode the reference computes with pandas
    value_counts().head(1)."""
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_returnflag", F.col("l_quantity").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    rk = F.row_number().over(
        W.partitionBy("l_returnflag").orderBy(F.desc("n"), "v")
    )
    return (
        cnt.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select("l_returnflag", F.col("v").alias("mode_qty"), F.col("n").alias("n_occurrences"))
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, order_year
    """,
    tags=["flagship", "tpch-q9", "J1", "A3"],
)
def q9_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit, adapted: p_retailprice stands
    in for the missing partsupp supplycost): profit per supplier nation
    per order year across a 5-table join. Part/supplier/nation broadcast;
    lineitem ⋈ orders is the one fact shuffle; the profit measure is a
    decimal-exact difference of products."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    profit_term = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(18,2)"
    ) - dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(
                s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("order_year")
        )
        .agg(F.sum(profit_term).cast("double").alias("profit"))
    )


@register(
    "j20_order_latency",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, MAX(l.l_shipdate)) AS d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(MIN(d) AS BIGINT) AS min_days,
           CAST(MAX(d) AS BIGINT) AS max_days,
           quantile_cont(d, 0.5) AS median_days
    FROM lat GROUP BY o_orderpriority
    """,
    tags=["J5", "A2", "lifecycle", "latency"],
)
def j20_order_latency(spark, sf_dir):
    """Order-lifecycle latency: order date to LAST line shipment, summary
    per priority. Per-order max over the orderkey shuffle, integer day
    deltas, exact interpolated median (a2 parity). The fulfillment-SLA
    report shape — one fact join, two partial-aggregated passes."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("last_ship").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("d"),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("d").cast("bigint").alias("min_days"),
        F.max("d").cast("bigint").alias("max_days"),
        F.percentile("d", F.lit(0.5)).alias("median_days"),
    )


@register(
    "a31_pivot_multi",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_nb,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS F_total,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_nb,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS O_total,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_nb,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS P_total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=["pivot", "A1", "A4"],
)
def a31_pivot_multi(spark, sf_dir):
    """Multi-aggregate pivot: status columns each carrying TWO measures
    (count + decimal-exact total) in one pass — Spark's pivot with a
    multi-agg list compiles to exactly the conditional-aggregation form
    the oracle writes out, so there is still only one shuffle with
    map-side partials."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "w17_purchase_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'purchase'
    ),
    grp AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS len FROM grp GROUP BY user_id, anchor
    )
    SELECT len AS streak_days, COUNT(*) AS n_streaks,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM streaks GROUP BY len
    """,
    tags=["window", "gaps-and-islands", "streaks", "events"],
)
def w17_purchase_streaks(spark, sf_dir):
    """Gaps-and-islands: consecutive-day purchase streak distribution.
    The classic island key is ``day - row_number()`` (constant within a
    run of consecutive days), so islands fall out of one per-user window
    plus an ordinary groupBy — no iterative logic. The (user, day) dedup
    is the skew-safe distinct; every later stage runs on streak-sized
    aggregates."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    days = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    grp = days.select(
        "user_id", "day", F.date_sub("day", rn).alias("anchor")
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy(F.col("len").alias("streak_days")).agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "w15_new_vs_returning",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    first_day AS (
      SELECT user_id, MIN(day) AS fday FROM activity GROUP BY user_id
    ),
    daily AS (
      SELECT a.day,
             COUNT(*) AS n_active,
             SUM(CASE WHEN f.fday = a.day THEN 1 ELSE 0 END) AS n_new
      FROM activity a JOIN first_day f ON f.user_id = a.user_id
      GROUP BY a.day
    )
    SELECT day, n_active, n_new,
           CAST(n_active - n_new AS BIGINT) AS n_returning,
           SUM(n_new) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_users
    FROM daily
    """,
    tags=["window", "retention", "growth", "events"],
)
def w15_new_vs_returning(spark, sf_dir):
    """New-vs-returning daily actives (the standard product growth
    decomposition): distinct (day, user) activity, each user's first day
    joined back, and a cumulative-acquisition running sum over the tiny
    |days| table. The (day, user) dedup is the skew-safe distinct shape
    (value rides the shuffle key); everything after runs on aggregates."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    activity = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    first_day = activity.groupBy("user_id").agg(F.min("day").alias("fday"))
    daily = (
        activity.join(first_day, on="user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(
                F.when(F.col("fday") == F.col("day"), 1).otherwise(0)
            ).alias("n_new"),
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).cast("bigint").alias("n_returning"),
        F.sum("n_new").over(w).alias("cum_users"),
    )


@register(
    "w16_interevent_percentiles",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           quantile_cont(gap_us, 0.5) AS p50_us,
           quantile_cont(gap_us, 0.9) AS p90_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    tags=["window", "A2", "timeseries", "events"],
)
def w16_interevent_percentiles(spark, sf_dir):
    """Inter-event gap distribution per event type: per-(user, type) lag
    over the total order, then exact interpolated percentiles over the
    INTEGER microsecond gaps — the lag+percentile composition (session
    tuning / anomaly baselines) with a2's exact-percentile parity. One
    window shuffle + one partial-aggregated percentile pass."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.percentile("gap_us", F.lit(0.5)).alias("p50_us"),
        F.percentile("gap_us", F.lit(0.9)).alias("p90_us"),
    )


@register(
    "t_top_terms",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tk WHERE length(tok) > 0 GROUP BY doc_id, tok
    ), dfq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ), n AS (SELECT COUNT(*) AS nd FROM documents),
    w AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * (ln((SELECT nd FROM n) + 1) - ln(dfq.df + 1) + 1)
               AS tfidf
      FROM tf JOIN dfq ON tf.tok = dfq.tok
      WHERE tf.doc_id < 50
    ),
    ranked AS (
      SELECT doc_id, tok, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok) AS rk
      FROM w
    )
    SELECT doc_id, rk, tok, tfidf FROM ranked WHERE rk <= 3
    """,
    tags=["text", "tfidf", "keywords", "A9"],
)
def t_top_terms(spark, sf_dir):
    """Keyword extraction: top-3 TF-IDF terms per document — the
    inverted-index weights (integer-domain ln, bit-exact) fed through a
    per-doc rank window with a token tie-break. Rank agreement across
    engines follows from weight bit-equality; doc_id < 50 bounds the
    driver compare."""
    from pyspark.sql import Window as W

    from datagouvfr_data_pipelines_spark.functions.text import tfidf_weights

    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    w = tfidf_weights(docs, "doc_id", "text", n_docs=n).where(
        F.col("doc_id") < 50
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    )
    return (
        w.select("doc_id", "tok", "tfidf", rk.alias("rk"))
        .where(F.col("rk") <= 3)
        .select("doc_id", "rk", "tok", "tfidf")
    )


@register(
    "a29_mad_by_group",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag, m.med,
           quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad
    FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
    GROUP BY 1, 2
    """,
    tags=["A2", "A8", "robust-stats", "mad"],
)
def a29_mad_by_group(spark, sf_dir):
    """Median absolute deviation per group — the robust scale estimate
    behind outlier gates that survive heavy tails (complements the IQR
    fence a26). Two exact-percentile passes: group medians (tiny,
    broadcast back) then the median of absolute deviations on the same
    fact shuffle key. Exact interpolated percentile parity is the same
    guarantee a2 pins."""
    li = table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("med")
    )
    return (
        li.join(F.broadcast(med), on="l_returnflag")
        .groupBy("l_returnflag", "med")
        .agg(
            F.percentile(
                F.abs(F.col("l_extendedprice") - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
    )


@register(
    "a30_gini_by_segment",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_mktsegment, o.o_custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT c_mktsegment,
             CAST(ROUND(total * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY total, o_custkey) AS rk
      FROM per_cust
    )
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           (2.0 * SUM(rk * cents)) / (COUNT(*) * SUM(cents))
             - (COUNT(*) + 1.0) / COUNT(*) AS gini
    FROM ranked GROUP BY 1
    """,
    tags=["window", "gini", "inequality", "A3"],
)
def a30_gini_by_segment(spark, sf_dir):
    """Gini coefficient of customer spend per market segment (revenue
    concentration): per-customer decimal-exact totals, a rank window
    PARTITIONED by segment, then the closed-form
    G = 2*sum(rank*x)/(n*sum(x)) - (n+1)/n. Spend re-quantizes to
    integer cents (ROUND of a 2-decimal double — never near .5, so both
    engines agree) so every sum is exact BIGINT arithmetic and the final
    expression is a fixed chain of IEEE ops."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"))
    )
    w = W.partitionBy("c_mktsegment").orderBy("total", "o_custkey")
    ranked = per_cust.select(
        "c_mktsegment",
        F.round(F.col("total") * 100).cast("bigint").alias("cents"),
        F.row_number().over(w).alias("rk"),
    )
    n = F.count(F.lit(1))
    return ranked.groupBy("c_mktsegment").agg(
        n.alias("n_customers"),
        (
            (F.lit(2.0) * F.sum(F.col("rk") * F.col("cents")))
            / (n * F.sum("cents"))
            - (n + F.lit(1.0)) / n
        ).alias("gini"),
    )


@register(
    "a28_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT p.p_partkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))) * 10000
                  AS BIGINT) AS rev_u
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_partkey
    ),
    ranked AS (
      SELECT p_partkey, rev_u,
             CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, p_partkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum_u,
             CAST(SUM(rev_u) OVER () AS BIGINT) AS total_u
      FROM rev
    )
    SELECT CASE WHEN cum_u * 5 <= total_u * 4 THEN 'A'
                WHEN cum_u * 20 <= total_u * 19 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(rev_u) AS BIGINT) AS class_rev_u
    FROM ranked GROUP BY 1
    """,
    tags=["window", "pareto", "abc", "A9", "A10"],
)
def a28_abc_classification(spark, sf_dir):
    """ABC/Pareto classification of parts by revenue share: cumulative
    revenue over the (revenue DESC, partkey) total order, classes cut at
    80%/95%. Revenue is exact integer 1e-4-currency units (decimal sum
    scaled), so the running total is associative and the cumsum runs as a
    DISTRIBUTED bucketed prefix sum (``global_prefix_sum``: deterministic
    fixed-width revenue buckets, bucket-local window, driver-folded
    64-row prefix map) — no global-order window anywhere, so the plan
    holds at |parts| ~ 200M. Class cuts compare integers (cum*5 <=
    total*4 ⇔ share <= 0.8) — no float division, hash-exact."""
    from datagouvfr_data_pipelines_spark.operators.windows import (
        global_prefix_sum,
    )

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey")
    rev = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(
            (
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("rev_u")
        )
        # consumed by 3 jobs inside global_prefix_sum (bounds, bucket
        # totals, final plan) — cache lifetime = session, as dsir/bidx
        .persist()
    )
    ranked = global_prefix_sum(
        rev,
        "rev_u",
        [F.col("rev_u").desc(), F.col("p_partkey").asc()],
        "rev_u",
        alias="cum_u",
        descending=True,
        total_alias="total_u",
    )
    cls = (
        F.when(F.col("cum_u") * 5 <= F.col("total_u") * 4, "A")
        .when(F.col("cum_u") * 20 <= F.col("total_u") * 19, "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_u").cast("bigint").alias("class_rev_u"),
    )


SEGMENT_RECIPE = {
    "table": "orders",
    "filter": "o_orderdate >= TIMESTAMP '1997-01-01'",
    "join": [
        {
            "table": "customer",
            "on": "o_custkey = c_custkey",
            "broadcast": True,
        }
    ],
    "derive": {"order_year": "CAST(year(o_orderdate) AS INT)"},
    "group_by": ["c_mktsegment", "order_year"],
    "agg": {
        "nb_orders": "count(1)",
        "total": "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)",
    },
    "order_by": ["total DESC", "c_mktsegment"],
    "limit": 15,
}


@register(
    "r1_recipe_segment_totals",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS nb_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY c.c_mktsegment, order_year
    ORDER BY total DESC, c.c_mktsegment
    LIMIT 15
    """,
    tags=["recipe", "declarative", "J1", "A3"],
)
def r1_recipe_segment_totals(spark, sf_dir):
    """Declarative recipe execution (plans/recipe.py): this query IS a
    checked-in config dict — filter, broadcast join, derived year,
    decimal-exact aggregate, ordered limit — compiled to an ordinary
    Catalyst plan. Proves the compiler adds no semantics of its own: the
    oracle is the mechanical SQL transliteration of the same spec, and
    the compiled plan keeps every engine guarantee (pushdown, broadcast,
    partial agg) because it is a plain DataFrame expression tree."""
    from datagouvfr_data_pipelines_spark.plans.recipe import compile_recipe

    return compile_recipe(
        SEGMENT_RECIPE, lambda t: table(spark, sf_dir, t)
    )


@register(
    "asm_contrastive_triplets",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             LEAD(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS positive_id
      FROM documents
    ),
    langs AS (
      SELECT lang,
             COALESCE(LEAD(lang) OVER (ORDER BY lang),
                      (SELECT MIN(lang) FROM documents)) AS next_lang
      FROM (SELECT DISTINCT lang FROM documents)
    )
    SELECT a.doc_id AS anchor_id, a.positive_id,
           n.doc_id AS negative_id, a.lang AS anchor_lang,
           n.lang AS negative_lang
    FROM ranked a
    JOIN langs l ON l.lang = a.lang
    JOIN ranked n ON n.lang = l.next_lang AND n.rn = a.rn
    WHERE a.positive_id IS NOT NULL
    """,
    tags=["assembly", "contrastive", "triplets", "ml-prep"],
)
def asm_contrastive_triplets(spark, sf_dir):
    """Contrastive (anchor, positive, negative) triplet generation for
    representation training: positive = the anchor's same-language
    successor (a weak-supervision proxy any metadata key can play),
    negative = the rank-aligned document from the cyclically NEXT
    language — deterministic, join-based, and uniform across languages,
    never a random sample that shifts between runs. Windows are
    partitioned by lang; the lang successor map is a tiny driver
    broadcast (same driver-scalar pattern as kmeans centroids). One
    shuffle on lang for the windows, one rank-aligned equi-join."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy("doc_id")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.lead("doc_id").over(w).alias("positive_id"),
    )
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    succ = {lang: langs[(i + 1) % len(langs)] for i, lang in enumerate(langs)}
    succ_map = F.create_map(
        *[x for k, v in succ.items() for x in (F.lit(k), F.lit(v))]
    )
    anchors = ranked.where(F.col("positive_id").isNotNull()).withColumn(
        "next_lang", succ_map[F.col("lang")]
    )
    negatives = ranked.select(
        F.col("doc_id").alias("negative_id"),
        F.col("lang").alias("negative_lang"),
        F.col("rn").alias("nrn"),
    )
    return anchors.join(
        negatives,
        (F.col("next_lang") == F.col("negative_lang"))
        & (F.col("rn") == F.col("nrn")),
    ).select(
        F.col("doc_id").alias("anchor_id"),
        "positive_id",
        "negative_id",
        F.col("lang").alias("anchor_lang"),
        "negative_lang",
    )
