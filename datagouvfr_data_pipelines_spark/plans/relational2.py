"""Catalog batch 2: pivot, quantile histograms, collect-agg, semver sort,
map lookup, outer joins, double-explode, union-distinct, streaming.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.text import tokens
from datagouvfr_data_pipelines_spark.operators.aggregates import dsum
from datagouvfr_data_pipelines_spark.plans.catalog import register, table

MONEY = "decimal(18,2)"


@register(
    "a1_pivot_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_qty_o,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS nb_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS nb_o
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=["pivot", "A1", "A4"],
)
def a1_pivot_stats(spark, sf_dir):
    """Pivot: the DVF stats unstack (dvf/explore/task_functions.py:544-560
    `nb_ventes_maison` / `moy_prix_m2_appartement` column vocabulary) as
    groupBy().pivot() with explicit pivot values (no extra pass to discover
    them — required at scale)."""
    li = table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast(MONEY)).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("nb"),
        )
    )
    return out.select(
        "l_returnflag",
        F.col("F_sum_qty").alias("sum_qty_f"),
        F.col("O_sum_qty").alias("sum_qty_o"),
        F.coalesce(F.col("F_nb"), F.lit(0)).alias("nb_f"),
        F.coalesce(F.col("O_nb"), F.lit(0)).alias("nb_o"),
    )


@register(
    "a8_quantile_bins",
    oracle="""
    WITH q AS (
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) AS bins,
             COUNT(*) AS nb
      FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus,
           CAST(generate_subscripts(bins, 1) - 1 AS INTEGER) AS decile,
           unnest(bins) AS edge,
           nb
    FROM q
    """,
    tags=["A8"],
)
def a8_quantile_bins(spark, sf_dir):
    """A8: exact decile bin edges per group (dvf/explore:839-896). Exact
    percentile for oracle parity; at 100 TB switch to
    percentile_approx(col, probs, 10000) with documented tolerance.
    The edges are exploded to (group, decile, edge) scalar rows so every
    output column is hash-canonicalizable by the driver gate."""
    orders = table(spark, sf_dir, "orders")
    probs = F.array(*[F.lit(i / 10.0) for i in range(11)])
    binned = orders.groupBy("o_orderstatus").agg(
        F.percentile(F.col("o_totalprice"), probs).alias("bins"),
        F.count(F.lit(1)).alias("nb"),
    )
    return binned.select(
        "o_orderstatus",
        F.posexplode("bins").alias("decile", "edge"),
        "nb",
    )


@register(
    "a8_histogram",
    oracle="""
    WITH mm AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders)
    SELECT CAST(LEAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 10)), 9) AS INTEGER) AS bucket,
           COUNT(*) AS nb
    FROM orders, mm GROUP BY 1
    """,
    tags=["A8"],
)
def a8_histogram(spark, sf_dir):
    """A8: equal-width 10-bin histogram — two-pass (tiny min/max broadcast,
    then one grouped count), the distributed form of pd.cut().value_counts()."""
    orders = table(spark, sf_dir, "orders")
    mm = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    return (
        orders.crossJoin(F.broadcast(mm))
        .select(
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / 10)
                ),
                F.lit(9),
            )
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("nb"))
    )


@register(
    "a17_collect_nations",
    oracle="""
    SELECT r_name, array_to_string(list_sort(list(n_name)), '|') AS nations,
           COUNT(*) AS nb_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=["A17"],
)
def a17_collect_nations(spark, sf_dir):
    """A17: collect-to-list aggregation (GeoJSON feature assembly shape,
    schema/irve/geo_utils/geo.py:80-94). sort_array makes the list
    deterministic — collect_list order is not. The list is serialized with
    array_join so the output is scalar and driver-canonicalizable."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations"),
            F.count(F.lit(1)).alias("nb_nations"),
        )
    )


@register(
    "o7_semver_sort",
    oracle="""
    SELECT p_partkey,
           'v' || CAST(p_size AS VARCHAR) || '.' || CAST(p_partkey % 7 AS VARCHAR)
               || '.' || CAST(p_partkey % 13 AS VARCHAR) AS version
    FROM part
    ORDER BY list_transform(string_split(substr('v' || CAST(p_size AS VARCHAR) || '.'
               || CAST(p_partkey % 7 AS VARCHAR) || '.' || CAST(p_partkey % 13 AS VARCHAR), 2), '.'),
             s -> CAST(s AS INTEGER)),
           p_partkey
    LIMIT 20
    """,
    tags=["O7", "O2"],
)
def o7_semver_sort(spark, sf_dir):
    """O7: custom-comparator (semver) sort — encode version as array<int>
    and sort on the array (schema/utils/consolidation.py:92-125), instead of
    a Python comparator."""
    part = table(spark, sf_dir, "part")
    version = F.concat(
        F.lit("v"),
        F.col("p_size").cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 7).cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 13).cast("string"),
    )
    df = part.select("p_partkey", version.alias("version"))
    semver_key = F.transform(
        F.split(F.substring(F.col("version"), 2, 100), "\\."),
        lambda s: s.cast("int"),
    )
    return df.orderBy(semver_key.asc(), F.col("p_partkey").asc()).limit(20)


@register(
    "p7_map_lookup",
    oracle="""
    SELECT CASE WHEN event_type = 'click' THEN 'engagement'
                WHEN event_type = 'view' THEN 'engagement'
                WHEN event_type = 'purchase' THEN 'revenue'
                ELSE 'ops' END AS category,
           COUNT(*) AS nb,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
    tags=["P7"],
)
def p7_map_lookup(spark, sf_dir):
    """P7: dictionary map/lookup column via a map literal
    (dvf/geoloc/task_functions.py:246-250 Series.map) — element_at on
    create_map, default through coalesce."""
    lookup = F.create_map(
        F.lit("click"), F.lit("engagement"),
        F.lit("view"), F.lit("engagement"),
        F.lit("purchase"), F.lit("revenue"),
    )
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.coalesce(F.element_at(lookup, F.col("event_type")), F.lit("ops")).alias(
                "category"
            ),
            "value",
        )
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("nb"), dsum("value", "sum_value"))
    )


@register(
    "j2_outer_supplier_nations",
    oracle="""
    SELECT n_name,
           COUNT(s_suppkey) AS nb_suppliers,
           COALESCE(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_acctbal
    FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=["J2"],
)
def j2_outer_supplier_nations(spark, sf_dir):
    """J2: outer equi-join keeping unmatched dimension rows
    (dvf/explore/task_functions.py:736-745 communes ∪ epci)."""
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    return (
        nation.join(supplier, nation["n_nationkey"] == supplier["s_nationkey"], "left")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("nb_suppliers"),
            F.coalesce(
                F.sum(F.col("s_acctbal").cast(MONEY)).cast("double"), F.lit(0.0)
            ).alias("sum_acctbal"),
        )
    )


@register(
    "j11_token_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_slice(string_split_regex(lower(trim(text)), '\\s+'), 1, 6) AS toks
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id, a AS tok_a, b AS tok_b
    FROM t, LATERAL unnest(t.toks) u(a), LATERAL unnest(t.toks) v(b)
    """,
    tags=["J11"],
)
def j11_token_pairs(spark, sf_dir):
    """J11: cross product within record (explode²) — DFI origins x
    destinations parcel pairs (dfi/task_functions.py:108-135)."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    t = docs.select("doc_id", F.slice(tokens("text"), 1, 6).alias("toks"))
    return (
        t.select("doc_id", "toks", F.explode("toks").alias("tok_a"))
        .select("doc_id", F.col("tok_a"), F.explode("toks").alias("tok_b"))
        .select("doc_id", "tok_a", "tok_b")
    )


@register(
    "u3_union_distinct_keys",
    oracle="""
    SELECT o_custkey AS user_key FROM orders
    UNION
    SELECT user_id AS user_key FROM events
    """,
    tags=["U3"],
)
def u3_union_distinct_keys(spark, sf_dir):
    """U3: set union of key domains (dvf/explore/task_functions.py:473-474)."""
    a = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("user_key"))
    b = table(spark, sf_dir, "events").select(F.col("user_id").alias("user_key"))
    return a.union(b).distinct()


@register(
    "w3_most_recent_valid_version",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority LIKE '1%' THEN 'v3'
                WHEN o_orderstatus = 'F' THEN 'v2'
                WHEN o_totalprice > 100000 THEN 'v1'
                END AS most_recent_valid_version
    FROM orders
    """,
    tags=["W3"],
)
def w3_most_recent_valid_version(spark, sf_dir):
    """W3: most-recent-valid-version — first match across version flags in
    semver-descending order (schema/utils/consolidation.py:156-174), as a
    single CASE cascade."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").startswith("1"), "v3")
        .when(F.col("o_orderstatus") == "F", "v2")
        .when(F.col("o_totalprice") > 100000, "v1")
        .alias("most_recent_valid_version"),
    )


@register(
    "st1_streaming_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS nb,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=["ST1", "ST4", "streaming"],
)
def st1_streaming_counts(spark, sf_dir):
    """ST1/ST4: Structured Streaming file source with Trigger.AvailableNow —
    the engine's veneer over the batch operators (SURVEY §2.9: the reference
    is scheduled micro-batch, dgv/metrics/task.py:59-72). Runs a real
    readStream -> grouped aggregate -> memory sink pass and returns the
    result; at scale the sink is a partitioned table with replaceWhere.
    """
    import os
    import uuid

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # the streaming file source wants a directory: stream the sf_dir with a
    # glob filter selecting only the events table
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb"), dsum("value", "sum_value")
    )
    name = f"st1_mem_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
