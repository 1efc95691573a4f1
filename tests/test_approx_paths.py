"""Approximate scale paths: the swaps documented for the 100 TB tier
(exact percentile -> percentile_approx, countDistinct -> HLL) must stay
within their advertised error bounds on real table data — otherwise the
documented swap would silently change results at scale."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_hll_distinct_within_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact <= 0.06  # 3x rsd


def test_percentile_approx_close_to_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).first()
    # accuracy 10000 -> rank error <= n/10000; price distribution is smooth
    # enough that the value error stays under 1%
    assert abs(row.approx - row.exact) / row.exact <= 0.01
