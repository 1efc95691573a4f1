"""Haversine distance checks against well-known city pairs."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.geo import haversine_km

# (name, lon1, lat1, lon2, lat2, expected_km) — great-circle references
CASES = [
    # Paris <-> Marseille ~ 660 km
    ("paris-marseille", 2.3522, 48.8566, 5.3698, 43.2965, 660.0, 10.0),
    # Paris <-> New York ~ 5837 km
    ("paris-nyc", 2.3522, 48.8566, -74.0060, 40.7128, 5837.0, 30.0),
    # zero distance
    ("same-point", 2.0, 48.0, 2.0, 48.0, 0.0, 1e-9),
    # antipodal-ish: half circumference ~ 20015 km
    ("antipodes", 0.0, 0.0, 180.0, 0.0, 20015.0, 5.0),
]


def test_haversine_known_distances(spark):
    df = spark.createDataFrame(
        [(n, a, b, c, d) for n, a, b, c, d, _, _ in CASES],
        "name string, lon1 double, lat1 double, lon2 double, lat2 double",
    )
    got = {
        r["name"]: r["km"]
        for r in df.select(
            "name", haversine_km("lon1", "lat1", "lon2", "lat2").alias("km")
        ).collect()
    }
    for name, _, _, _, _, want, tol in CASES:
        assert abs(got[name] - want) <= tol, (name, got[name], want)


def test_haversine_symmetry(spark):
    df = spark.createDataFrame(
        [(2.3522, 48.8566, 5.3698, 43.2965)],
        "lon1 double, lat1 double, lon2 double, lat2 double",
    )
    row = df.select(
        haversine_km("lon1", "lat1", "lon2", "lat2").alias("ab"),
        haversine_km("lon2", "lat2", "lon1", "lat1").alias("ba"),
    ).collect()[0]
    assert row["ab"] == row["ba"]
