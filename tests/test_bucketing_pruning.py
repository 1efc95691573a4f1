"""Physical-layout features: bucketed shuffle-free joins, partition pruning."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.io.bucketing import cobucketed_join, write_bucketed
from datagouvfr_data_pipelines_spark.io.writers import overwrite_date_partition


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_cobucketed_join_no_shuffle(spark, tmp_path):
    # note: warehouse dir is a static conf — managed tables land in the
    # session default ($PWD/spark-warehouse) and are dropped at the end
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"
    )
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    write_bucketed(orders, "orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "lineitem_b", ["o_orderkey"], n_buckets=8)

    # disable auto-broadcast: at test scale the planner would broadcast and
    # bypass bucketing entirely ("Bucketed: false (disabled by query
    # planner)"); at fact-x-fact scale broadcast isn't an option and the
    # bucketed layout is what removes the shuffle.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "orders_b", "lineitem_b", ["o_orderkey"])
        plan = _plan(joined)
        # the whole point: co-located join without a shuffle
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # sanity: same result as the plain join
        assert joined.count() == orders.join(lineitem, "o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE orders_b")
        spark.sql("DROP TABLE lineitem_b")


def test_partition_pruning_on_date_partitioned_sink(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2024-01-0%d" % (i % 9 + 1), i) for i in range(100)], "d string, v int"
    )
    overwrite_date_partition(df, path, "d")
    read = spark.read.parquet(path).where(F.col("d") == "2024-01-03")
    plan = _plan(read)
    assert "PartitionFilters" in plan
    # only one partition's rows come back, without scanning the rest
    assert read.count() == len([i for i in range(100) if i % 9 + 1 == 3])
