"""Catalog batch 9 (round 3): time-series windows — event-time rolling
aggregate, the full rank family, and regular-grid gap filling with linear
interpolation."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "w6_rolling_window_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_30d
    FROM orders WHERE o_custkey < 300
    """,
    tags=["window", "timeseries", "range-frame"],
)
def w6_rolling_window_sum(spark, sf_dir):
    """Trailing-30-day order total per customer: event-time RANGE frame on
    epoch micros (operators/timeseries.py:rolling_time_sum) — same-instant
    peers aggregate together, so the result is total-order independent."""
    from datagouvfr_data_pipelines_spark.operators.timeseries import (
        rolling_time_sum,
    )

    orders = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 300)
    out = rolling_time_sum(
        orders, ["o_custkey"], "o_orderdate", "o_totalprice",
        window_seconds=30 * 86400, alias="rolling_30d",
    )
    return out.select("o_orderkey", "o_custkey", "rolling_30d")


@register(
    "a20_rank_family",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           round(PERCENT_RANK() OVER w, 6) AS prnk,
           round(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER w2 AS INT) AS quartile
    FROM customer
    WINDOW w  AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC),
           w2 AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=["window", "rank"],
)
def a20_rank_family(spark, sf_dir):
    """The full analytic-rank family per nation by account balance.
    rank/dense_rank/percent_rank/cume_dist use the VALUE ordering (peers
    tie); ntile needs a TOTAL order (tiles are positional), so its window
    adds the key tiebreak — same split as the oracle."""
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    w2 = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w2).alias("quartile"),
    )


@register(
    "w7_gap_fill_interpolate",
    oracle="""
    WITH m AS (
      SELECT c.c_nationkey AS k,
             CAST(date_diff('month', TIMESTAMP '1992-01-01',
                            date_trunc('month', o.o_orderdate)) AS BIGINT)
               AS slot,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderpriority = '1-URGENT'
      GROUP BY 1, 2
    ), b AS (
      SELECT k, MIN(slot) AS mn, MAX(slot) AS mx FROM m GROUP BY k
    ), grid AS (
      SELECT b.k, unnest(generate_series(b.mn, b.mx)) AS slot FROM b
    ), j AS (
      SELECT g.k, g.slot, m.total FROM grid g
      LEFT JOIN m ON m.k = g.k AND m.slot = g.slot
    ), c AS (
      SELECT k, slot, total,
             last_value(total IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN total IS NOT NULL THEN slot END
                        IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps,
             first_value(total IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY slot
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN total IS NOT NULL THEN slot END
                         IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY slot
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ns
      FROM j
    )
    SELECT k AS c_nationkey, slot,
           round(CASE WHEN total IS NOT NULL THEN total
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * ((slot - ps) / (ns - ps))
                 END, 6) AS filled,
           total IS NOT NULL AS is_observed
    FROM c
    """,
    tags=["window", "timeseries", "gap-fill"],
)
def w7_gap_fill_interpolate(spark, sf_dir):
    """Monthly urgent-order totals per nation, densified to every month in
    each nation's observed range with linear interpolation over the gaps
    (operators/timeseries.py:gap_fill_interpolate)."""
    from datagouvfr_data_pipelines_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_nationkey",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")),
                F.lit("1992-01-01").cast("timestamp"),
            )
            .cast("long")
            .alias("slot"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total")
        )
    )
    return gap_fill_interpolate(
        monthly, ["c_nationkey"], "slot", "total", filled_alias="filled"
    )


@register(
    "asm_weighted_sample",
    oracle="""
    WITH h AS (
      SELECT lang, doc_id, n_chars,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   string_split('42-' || CAST(doc_id AS VARCHAR), ''),
                   c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 2147483647
             ) AS hh
      FROM documents WHERE n_chars > 0
    ), sk AS (
      SELECT lang, doc_id, n_chars,
             (ln(hh + 1) - ln(2147483648.0)) / n_chars AS wkey
      FROM h
    )
    SELECT lang, doc_id, n_chars,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY lang ORDER BY wkey DESC, doc_id
           ) AS BIGINT) AS sample_rank,
           round(wkey, 6) AS sample_key
    FROM sk
    QUALIFY sample_rank <= 15
    """,
    tags=["assembly", "sampling", "weighted"],
)
def asm_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement, 15 docs per
    language, probability proportional to length (operators/assembly.py:
    weighted_sample — Efraimidis-Spirakis keys from the portable rolling
    hash; ln stays on integer inputs for oracle bit-parity)."""
    from datagouvfr_data_pipelines_spark.operators.assembly import (
        weighted_sample,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    out = weighted_sample(
        docs.select("lang", "doc_id", "n_chars"),
        id_col="doc_id",
        weight_col="n_chars",
        k=15,
        strata_cols=["lang"],
        seed=42,
    )
    return out.select("lang", "doc_id", "n_chars", "sample_rank", "sample_key")


def _pagerank_quantized_oracle(iters: int = 6) -> str:
    """Unrolled quantized-float-PageRank oracle (the g_pagerank_exact
    trick): one CTE trio per iteration, mirroring
    operators/graph.py:pagerank_quantized term for term — BIGINT
    pico-units, IEEE DOUBLE division at the two real division sites
    (rank/deg, dangling/n) floored back to integers, damping as the exact
    integer (17*x)//20."""
    scale = 1_000_000_000_000
    sql = """
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (
      SELECT node, CAST({scale} AS BIGINT) // (SELECT n FROM nn) AS rank
      FROM nodes
    )""".replace("{scale}", str(scale))
    for i in range(iters):
        sql += f""",
    in{i} AS (
      SELECT e.dst AS node,
             SUM(CAST(FLOOR(CAST(r.rank AS DOUBLE) / CAST(deg.d AS DOUBLE))
                      AS BIGINT)) AS inn
      FROM edges e
      JOIN r{i} r ON r.node = e.src
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    dang{i} AS (
      SELECT CAST(FLOOR(CAST(COALESCE(SUM(r.rank), 0) AS DOUBLE)
                        / CAST((SELECT n FROM nn) AS DOUBLE)) AS BIGINT)
               AS share
      FROM r{i} r WHERE r.node NOT IN (SELECT src FROM edges)
    ),
    r{i + 1} AS MATERIALIZED (
      SELECT n.node,
             (3 * {scale}) // (20 * (SELECT n FROM nn))
             + (17 * (COALESCE(i.inn, 0) + (SELECT share FROM dang{i}))) // 20
               AS rank
      FROM nodes n LEFT JOIN in{i} i ON i.node = n.node
    )"""
    return (
        sql
        + f"""
    SELECT node, rank AS rank_pico,
           CAST(rank AS DOUBLE) / 1000000000000.0 AS rank
    FROM r{iters}"""
    )


@register(
    "g_pagerank",
    oracle=_pagerank_quantized_oracle(6),
    tags=["graph", "pagerank", "quantized-float"],
)
def g_pagerank(spark, sf_dir):
    """PageRank over the customer->supplier purchase graph (edges from
    lineitem x orders), 6 iterations with dangling-mass redistribution.

    Oracle-checked since round 5 (judge item 6): runs
    operators/graph.py:pagerank_quantized — real IEEE float division at
    the rank/deg and dangling/n sites, floor-quantized to BIGINT
    pico-units so integer sums keep the trajectory partition-independent —
    and the oracle unrolls the same six iterations CTE-for-CTE (the
    g_pagerank_exact trick). The pure-float pagerank stays as the
    tolerance-tested operator (tests pin quantized-vs-float agreement);
    g_pagerank_exact remains the all-integer twin."""
    from datagouvfr_data_pipelines_spark.operators.graph import (
        pagerank_quantized,
    )

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + F.lit(1_000_000)).alias("dst"),
    ).distinct()
    out = pagerank_quantized(edges, "src", "dst", iterations=6)
    return out.select(
        "node",
        F.col("rank").alias("rank_pico"),
        (F.col("rank").cast("double") / F.lit(1_000_000_000_000.0)).alias("rank"),
    )


@register(
    "t_tfidf_weights",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tk WHERE length(tok) > 0 GROUP BY doc_id, tok
    ), dfq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ), n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
           tf.tf * (ln((SELECT nd FROM n) + 1) - ln(dfq.df + 1) + 1)
             AS tfidf
    FROM tf JOIN dfq ON tf.tok = dfq.tok
    WHERE tf.doc_id < 100
    """,
    tags=["text", "tfidf"],
)
def t_tfidf_weights(spark, sf_dir):
    """TF-IDF term weights (functions/text.py:tfidf_weights) — integer-
    domain ln keeps every weight bit-identical to the oracle; emitted for
    doc_id < 100 to bound the driver compare."""
    from datagouvfr_data_pipelines_spark.functions.text import tfidf_weights

    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    w = tfidf_weights(docs, "doc_id", "text", n_docs=n)
    return w.where(F.col("doc_id") < 100)


@register(
    "d_tfidf_neardups",
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
      SELECT tf.doc_id AS id, tf.tok,
             tf.tf * (ln((SELECT nd FROM n) + 1) - ln(dfq.df + 1) + 1) AS w
      FROM tf JOIN dfq ON tf.tok = dfq.tok
      WHERE dfq.df * 10 <= (SELECT nd FROM n)
    ), norms AS (
      SELECT id,
             SUM(CAST(floor(w * w * 1e9) AS BIGINT)) / 1e9 AS norm2
      FROM w GROUP BY id
    ), dots AS (
      SELECT a.id AS id_a, b.id AS id_b,
             SUM(CAST(floor(a.w * b.w * 1e9) AS BIGINT)) / 1e9 AS dot
      FROM w a JOIN w b ON a.tok = b.tok AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT d.id_a, d.id_b,
           round(d.dot / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) AS cosine
    FROM dots d
    JOIN norms na ON d.id_a = na.id
    JOIN norms nb ON d.id_b = nb.id
    WHERE round(d.dot / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) >= 0.3
    """,
    tags=["dedup", "tfidf", "inverted-index"],
)
def d_tfidf_neardups(spark, sf_dir):
    """Lexical near-duplicate pairs via TF-IDF sparse cosine through the
    inverted index (functions/text.py:tfidf_cosine_pairs) — pairs only
    materialize for documents sharing a DISCRIMINATIVE token (df <= N/10
    stop-token cut = the scale practice that keeps hot keys out of the
    token shuffle)."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        tfidf_cosine_pairs,
        tfidf_weights,
    )

    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    w = tfidf_weights(docs, "doc_id", "text", n_docs=n).where(
        F.col("df") * 10 <= F.lit(n)
    )
    return tfidf_cosine_pairs(w, "doc_id", min_cosine=0.3)


@register(
    "j16_fuzzy_pairs",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name FROM part WHERE p_partkey <= 400
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM p a JOIN p b
      ON substring(lower(a.p_name), 1, 6) = substring(lower(b.p_name), 1, 6)
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 6
    """,
    tags=["join", "fuzzy", "entity-resolution"],
)
def j16_fuzzy_pairs(spark, sf_dir):
    """Entity-resolution fuzzy self-join on part names: 6-char prefix
    blocking -> Levenshtein <= 6 verify (operators/joins.py:fuzzy_join) —
    blocked equi-join, never all-pairs."""
    from datagouvfr_data_pipelines_spark.operators.joins import fuzzy_join

    parts = table(spark, sf_dir, "part").select("p_partkey", "p_name").where(
        F.col("p_partkey") <= 400
    )
    out = fuzzy_join(
        parts, parts, "p_name", "p_name", max_edit=6, block_chars=6
    ).where(F.col("p_partkey") < F.col("p_partkey_r"))
    return out.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_partkey_r").alias("key_b"),
        F.col("p_name").alias("name_a"),
        F.col("p_name_r").alias("name_b"),
        F.levenshtein(F.col("p_name"), F.col("p_name_r"))
        .cast("int")
        .alias("edit_dist"),
    )


@register(
    "q_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS column,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
    tags=["quality", "profiling"],
)
def q_profile_orders(spark, sf_dir):
    """One-pass column profile (operators/profiling.py:profile_columns):
    every statistic for every column in a single partial-aggregated job,
    unpivoted with stack — the pre-publish inspection the reference does
    with report notebooks."""
    from datagouvfr_data_pipelines_spark.operators.profiling import (
        profile_columns,
    )

    orders = table(spark, sf_dir, "orders")
    return profile_columns(
        orders, ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    )


@register(
    "q_psi_drift",
    oracle="""
    WITH base AS (
      SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0
    ), cur AS (
      SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 1
    ), e AS (
      SELECT [quantile_cont(v, 0.25), quantile_cont(v, 0.5),
              quantile_cont(v, 0.75)] AS edges
      FROM base
    ), ab AS (
      SELECT len(list_filter((SELECT edges FROM e), x -> v >= x)) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1
    ), cb AS (
      SELECT len(list_filter((SELECT edges FROM e), x -> v >= x)) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM cur GROUP BY 1
    ), bins AS (
      SELECT coalesce(ab.bin, cb.bin) AS bin,
             coalesce(ab.c, 0) + 1 AS ca,
             coalesce(cb.c, 0) + 1 AS cb
      FROM ab FULL JOIN cb ON ab.bin = cb.bin
    ), t AS (
      SELECT SUM(ca) AS na, SUM(cb) AS nb FROM bins
    )
    SELECT (SELECT na FROM t) AS n_base_smoothed,
           (SELECT nb FROM t) AS n_current_smoothed,
           round(SUM(CAST(floor(
             ((ca / CAST((SELECT na FROM t) AS DOUBLE))
              - (cb / CAST((SELECT nb FROM t) AS DOUBLE)))
             * (ln(ca * (SELECT nb FROM t)) - ln(cb * (SELECT na FROM t)))
             * 1e9) AS BIGINT)) / 1e9, 6) AS psi
    FROM bins
    """,
    tags=["quality", "drift", "psi"],
)
def q_psi_drift(spark, sf_dir):
    """PSI drift between two order snapshots (even vs odd orderkeys) over
    o_totalprice, quartile bins from the base snapshot's EXACT percentiles
    (a2 precedent: Spark percentile hash-matches DuckDB quantile_cont), so
    the whole score is oracle-bit-identical
    (operators/profiling.py:psi_drift)."""
    from datagouvfr_data_pipelines_spark.operators.profiling import psi_drift

    orders = table(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 2 == 0)
    cur = orders.where(F.col("o_orderkey") % 2 == 1)
    edges = list(
        base.agg(
            F.percentile(F.col("o_totalprice"), F.lit(0.25)).alias("q1"),
            F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("q2"),
            F.percentile(F.col("o_totalprice"), F.lit(0.75)).alias("q3"),
        ).collect()[0]
    )
    return psi_drift(base, cur, "o_totalprice", edges=edges)


@register(
    "a21_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey <= 300
    UNION ALL
    SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
    FROM part WHERE p_partkey <= 300
    """,
    tags=["unpivot", "melt"],
)
def a21_unpivot(spark, sf_dir):
    """Unpivot/melt — wide measures to long (id, measure, value) rows with
    one shuffle-free stack projection (operators/cleaning.py:melt), the
    inverse of the a1 pivot."""
    from datagouvfr_data_pipelines_spark.operators.cleaning import melt

    part = table(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    return melt(part, ["p_partkey"], ["p_size", "p_retailprice"])


@register(
    "a22_mom_growth",
    oracle="""
    WITH m AS (
      SELECT c.c_nationkey,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_nationkey, month, total,
           round(
             (total - LAG(total) OVER w) / LAG(total) OVER w, 6
           ) AS mom_growth
    FROM m WINDOW w AS (PARTITION BY c_nationkey ORDER BY month)
    """,
    tags=["window", "timeseries", "growth"],
)
def a22_mom_growth(spark, sf_dir):
    """Month-over-month growth per nation: decimal-exact monthly totals,
    lag window, exact-binary ratio (NULL for each nation's first month)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    m = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_nationkey",
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
                "month"
            ),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("month").asc())
    prev = F.lag("total").over(w)
    return m.select(
        "c_nationkey",
        "month",
        "total",
        F.round((F.col("total") - prev) / prev, 6).alias("mom_growth"),
    )


@register(
    "j17_effective_dated_join",
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
      SELECT o_custkey, run, st, MIN(ts) AS valid_from
      FROM r GROUP BY o_custkey, run, st
    ), h AS (
      SELECT o_custkey, st, valid_from,
             LEAD(valid_from) OVER (
               PARTITION BY o_custkey ORDER BY valid_from, run
             ) AS valid_to
      FROM g
    ), live AS (
      SELECT * FROM h WHERE valid_to IS NULL OR valid_to > valid_from
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           live.st AS status_in_effect
    FROM orders o JOIN live
      ON live.o_custkey = o.o_custkey AND live.valid_from <= o.o_orderdate
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o.o_orderkey ORDER BY live.valid_from DESC
    ) = 1
    """,
    tags=["join", "scd2", "as-of", "history"],
)
def j17_effective_dated_join(spark, sf_dir):
    """Effective-dated dimension join: each order joined to the SCD2 status
    version in effect on its date (operators/history.py:
    effective_dated_join = scd2_history + backward as-of, one window
    shuffle — no range-predicate join). Zero-length intervals (same-instant
    run splits) are never 'in effect' and are excluded on both sides."""
    from datagouvfr_data_pipelines_spark.operators.history import (
        effective_dated_join,
        scd2_history,
    )

    orders = table(spark, sf_dir, "orders")
    hist = scd2_history(
        orders,
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    ).where(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    ).select(
        "o_custkey", F.col("o_orderstatus").alias("status_in_effect"), "valid_from"
    )
    fact = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    out = effective_dated_join(
        fact, hist, "o_custkey", "o_orderdate", attr_cols=["status_in_effect"]
    )
    return out.select(
        "o_orderkey", "o_custkey", "o_orderdate", "status_in_effect"
    )


@register(
    "a23_standardize",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sm,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           CASE WHEN s.n > 1 THEN round(
             (l.l_extendedprice - s.sm / s.n)
             / sqrt((s.s2 - s.n * (s.sm / s.n) * (s.sm / s.n)) / (s.n - 1)),
             6) END AS zscore
    FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
    WHERE l.l_orderkey <= 2000
    """,
    tags=["aggregation", "standardize", "ml-prep"],
)
def a23_standardize(spark, sf_dir):
    """Per-group z-score standardization with decimal-exact moments
    (operators/aggregates.py:standardize — the a15 variance policy applied
    row-wise); bounded to l_orderkey <= 2000 for the driver compare."""
    from datagouvfr_data_pipelines_spark.operators.aggregates import (
        standardize,
    )

    li = table(spark, sf_dir, "lineitem")
    out = standardize(li, ["l_returnflag"], "l_extendedprice")
    return out.where(F.col("l_orderkey") <= 2000).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "zscore"
    )


@register(
    "q_join_explosion",
    oracle="""
    WITH lc AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_left
      FROM lineitem GROUP BY l_partkey
    ), rc AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_right
      FROM lineitem GROUP BY l_partkey
    )
    SELECT lc.l_partkey, lc.n_left, rc.n_right,
           lc.n_left * rc.n_right AS est_pairs
    FROM lc JOIN rc ON lc.l_partkey = rc.l_partkey
    ORDER BY est_pairs DESC, lc.l_partkey
    LIMIT 10
    """,
    tags=["quality", "diagnostics", "join-cardinality"],
)
def q_join_explosion(spark, sf_dir):
    """Pre-flight join-cardinality diagnostic (operators/profiling.py:
    join_explosion_report): the 10 keys that would contribute the most
    pairs to a lineitem self-join on l_partkey — count-to-count join, the
    fact table is never joined."""
    from datagouvfr_data_pipelines_spark.operators.profiling import (
        join_explosion_report,
    )

    li = table(spark, sf_dir, "lineitem")
    return join_explosion_report(li, li, ["l_partkey"], top_n=10)


@register(
    "w8_funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t_1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_2
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t_1, s2.t_2, s3.t_3,
           CAST((s1.t_1 IS NOT NULL)::INT + (s2.t_2 IS NOT NULL)::INT
                + (s3.t_3 IS NOT NULL)::INT AS INT) AS stage
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    tags=["window", "funnel", "events"],
)
def w8_funnel_stages(spark, sf_dir):
    """Ordered funnel view -> click -> purchase per user
    (operators/windows.py:funnel_stages): earliest-completion greedy, each
    step strictly after the previous step's anchor — exact stage count by
    the exchange argument."""
    from datagouvfr_data_pipelines_spark.operators.windows import (
        funnel_stages,
    )

    ev = table(spark, sf_dir, "events")
    out = funnel_stages(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )
    return out.select("user_id", "t_1", "t_2", "t_3", "stage")


@register(
    "w9_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('month', MIN(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id,
             f.cohort,
             CAST(date_diff('month', f.cohort,
                            date_trunc('month', e.ts)) AS BIGINT) AS month_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort, month_offset, CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort, month_offset
    """,
    tags=["window", "cohort", "retention", "events"],
)
def w9_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users cohorted by first-activity month,
    counted once per (cohort, month-offset) they were active in. Two
    partial-aggregated groupBys + one key join — the classic retention
    triangle, distributed."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("month", F.min("ts"))).alias("cohort")
    )
    activity = (
        ev.join(firsts, on="user_id")
        .select(
            "user_id",
            "cohort",
            F.months_between(
                F.date_trunc("month", F.col("ts")),
                F.col("cohort").cast("timestamp"),
            )
            .cast("long")
            .alias("month_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort", "month_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


@register(
    "u5_field_change_stats",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 3 != 0
    ), b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 2 != 0
    ), joined AS (
      SELECT a.o_orderkey,
             (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)::INT AS c1,
             (a.o_totalprice IS DISTINCT FROM b.o_totalprice)::INT AS c2,
             (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)::INT AS c3
      FROM a JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT col AS column, n_changed, n_compared FROM (
      SELECT 'o_orderstatus' AS col,
             CAST(SUM(c1) AS BIGINT) AS n_changed,
             CAST(COUNT(*) AS BIGINT) AS n_compared FROM joined
      UNION ALL
      SELECT 'o_totalprice', CAST(SUM(c2) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM joined
      UNION ALL
      SELECT 'o_orderpriority', CAST(SUM(c3) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM joined
    )
    """,
    tags=["setops", "cdc", "diff", "diagnostics"],
)
def u5_field_change_stats(spark, sf_dir):
    """Per-FIELD change statistics between two snapshots of a keyed table
    (operators/setops.py:field_change_stats): one key join, every column's
    null-safe change flag summed in the same partial-aggregated pass, stack
    unpivot — the column-level companion to u2's row-level CDC diff.
    Snapshots here are synthesized from orders with deterministic edits."""
    from datagouvfr_data_pipelines_spark.operators.setops import (
        field_change_stats,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    a = orders.where(F.col("o_orderkey") % 3 != 0)
    b = orders.where(F.col("o_orderkey") % 2 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderpriority",
    )
    return field_change_stats(
        a, b, ["o_orderkey"],
        ["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
