"""Catalog batch 6: tumbling event-time windows and the geo family under
the oracle gate (lon/lat synthesized deterministically from event values)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.geo import within_france
from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "st4_tumbling_windows",
    oracle="""
    SELECT date_trunc('day', ts) + INTERVAL 0 SECOND AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
           COUNT(*) AS nb,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=["ST4"],
)
def st4_tumbling_windows(spark, sf_dir):
    """ST4: tumbling 1-day event-time windows (daily grain from log
    timestamps, create_tables.sql:209-263) via the window() function —
    works identically on a streaming frame with a watermark."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "nb",
            "sum_value",
        )
    )


# deterministic synthetic coordinates: both engines compute the same double
# arithmetic from the stored `value` column
_LON_SQL = "(CAST(value AS DOUBLE) * 7 - FLOOR(CAST(value AS DOUBLE) * 7 / 360) * 360) - 180"
_LAT_SQL = "(CAST(value AS DOUBLE) * 3 - FLOOR(CAST(value AS DOUBLE) * 3 / 180) * 180) - 90"


def _lon():
    v = F.col("value").cast("double") * 7
    return (v - F.floor(v / 360) * 360) - 180


def _lat():
    v = F.col("value").cast("double") * 3
    return (v - F.floor(v / 180) * 180) - 90


def _france_pnpoly_sql() -> str:
    from datagouvfr_data_pipelines_spark.functions.geo import (
        FRANCE_RINGS,
        pnpoly_sql,
    )

    return pnpoly_sql(FRANCE_RINGS, "lon", "lat")


@register(
    "geo_bbox_stats",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events
    )
    SELECT event_type,
           COUNT(*) AS nb_points,
           CAST(SUM(CASE WHEN {_france_pnpoly_sql()}
                 THEN 1 ELSE 0 END) AS BIGINT) AS nb_in_france,
           MIN(lon) AS xmin, MIN(lat) AS ymin, MAX(lon) AS xmax, MAX(lat) AS ymax
    FROM pts GROUP BY event_type
    """,
    tags=["geo", "A5"],
)
def geo_bbox_stats(spark, sf_dir):
    """§2.8 geospatial: point-in-France classification + bbox aggregation
    (geo.py:25-29 within test; conversions.py:96-100 ST_Extent_Agg) over
    deterministic synthetic coordinates."""
    ev = table(spark, sf_dir, "events")
    pts = ev.select("event_type", _lon().alias("lon"), _lat().alias("lat"))
    return pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb_points"),
        F.sum(F.when(within_france("lon", "lat"), 1).otherwise(0)).alias("nb_in_france"),
        F.min("lon").alias("xmin"),
        F.min("lat").alias("ymin"),
        F.max("lon").alias("xmax"),
        F.max("lat").alias("ymax"),
    )
