"""Round-9 queries: geometry-as-data point-in-polygon.

The literal-rings form (functions/geo.py:point_in_rings) unrolls the
polygon into the plan — right for broadcast-dim admin boundaries, useless
when every row carries its own GeoJSON geometry (consolidation over
arbitrary feature collections). ``point_in_polygon_col`` folds the same
even-odd fill rule over an ``array<array<array<double>>>`` rings COLUMN
with constant expression size. Reference parity:
schema/irve/geo_utils/geo.py:25-29 (commune contains-point checks) and
carburants/scripts/reformat_prix.py:108-120, generalized to per-row
geometry.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "geo_pip_rings",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 7 AS DOUBLE) AS cx,
             CAST(c_custkey % 5 AS DOUBLE) AS cy,
             CAST(c_custkey % 11 AS DOUBLE) - 2.5 AS px,
             CAST(c_custkey % 13 AS DOUBLE) - 4.5 AS py
      FROM customer
    )
    SELECT c_custkey, px, py,
           CASE WHEN c_custkey % 2 = 0 THEN
             (ABS(px - cx) < 2 AND ABS(py - cy) < 2)
               AND NOT (ABS(px - cx) < 1 AND ABS(py - cy) < 1)
           ELSE
             py > cy - 1 AND py < cy + 2
               AND px > cx - 2 + (py - (cy - 1)) * 2 / 3
               AND px < cx + 2 - (py - (cy - 1)) * 2 / 3
           END AS inside
    FROM pts
    ORDER BY c_custkey
    """,
    tags=["geo", "pip", "geometry-as-data"],
)
def geo_pip_rings(spark, sf_dir):
    """Per-row geometry PIP: even customers carry a square-with-hole
    MultiRing (two rings — union minus hole under the even-odd rule), odd
    customers a triangle (slanted edges exercise the crossing-longitude
    interpolation, which axis-parallel rectangles never touch). Points sit
    on a half-integer grid so none lands on a boundary — the ORACLE is the
    independent geometric truth (box containment / half-plane tests), not
    a replica of the ray-cast, so the fill-rule algebra itself is what is
    being checked. Shuffle-free scan->project plan; geometry arrives as
    DATA (array<array<array<double>>>), expression size constant in the
    vertex count."""
    from datagouvfr_data_pipelines_spark.functions.geo import (
        point_in_polygon_col,
    )

    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cx = (k % 7).cast("double")
    cy = (k % 5).cast("double")
    px = (k % 11).cast("double") - F.lit(2.5)
    py = (k % 13).cast("double") - F.lit(4.5)

    def pt(a, b):
        return F.array(a, b)

    two, one = F.lit(2.0), F.lit(1.0)
    square_with_hole = F.array(
        F.array(
            pt(cx - two, cy - two), pt(cx + two, cy - two),
            pt(cx + two, cy + two), pt(cx - two, cy + two),
        ),
        F.array(
            pt(cx - one, cy - one), pt(cx + one, cy - one),
            pt(cx + one, cy + one), pt(cx - one, cy + one),
        ),
    )
    triangle = F.array(
        F.array(pt(cx - two, cy - one), pt(cx + two, cy - one), pt(cx, cy + two))
    )
    rings = F.when(k % 2 == 0, square_with_hole).otherwise(triangle)
    return (
        c.select(
            "c_custkey",
            px.alias("px"),
            py.alias("py"),
            rings.alias("rings"),
        )
        .select(
            "c_custkey",
            "px",
            "py",
            point_in_polygon_col("px", "py", "rings").alias("inside"),
        )
        .orderBy("c_custkey")
    )
