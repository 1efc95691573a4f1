"""Geo column functions + pandas-UDF surface (F1/F7, multimodal)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.geo import (
    bbox_aggregate,
    bbox_struct,
    fix_reversed_coords,
    morton_key,
    spatially_ordered,
    within_france,
)
from datagouvfr_data_pipelines_spark.functions.udfs import (
    check_urls,
    extract_media_metadata,
    geocode_cascade,
)


def _points(spark):
    return spark.createDataFrame(
        [
            ("paris", 2.35, 48.85),
            ("reversed", 48.85, 2.35),       # lat/lon swapped
            ("new_york", -74.0, 40.7),
            ("reunion", 55.5, -21.1),
        ],
        "name string, lon double, lat double",
    )


def test_within_france(spark):
    df = _points(spark).withColumn("inside", within_france("lon", "lat"))
    got = {r["name"]: r["inside"] for r in df.collect()}
    assert got == {
        "paris": True, "reversed": False, "new_york": False, "reunion": True
    }


def test_fix_reversed_coords(spark):
    out = fix_reversed_coords(_points(spark), "lon", "lat")
    got = {r["name"]: (r["lon"], r["lat"]) for r in out.collect()}
    assert got["reversed"] == (2.35, 48.85)   # repaired
    assert got["paris"] == (2.35, 48.85)      # untouched
    assert got["new_york"] == (-74.0, 40.7)   # not France either way: untouched


def test_bbox(spark):
    df = _points(spark)
    row = bbox_aggregate(df, "lon", "lat").collect()[0]
    assert row["xmin"] == -74.0 and row["xmax"] == 55.5
    s = df.select(bbox_struct("lon", "lat").alias("b")).collect()[0]["b"]
    assert s["xmin"] == s["xmax"] == 2.35


def test_morton_key_locality(spark):
    # nearby points must get closer keys than far-apart points
    df = spark.createDataFrame(
        [("a", 2.35, 48.85), ("b", 2.36, 48.86), ("c", 150.0, -40.0)],
        "name string, lon double, lat double",
    ).withColumn("k", morton_key("lon", "lat"))
    got = {r["name"]: r["k"] for r in df.collect()}
    assert abs(got["a"] - got["b"]) < abs(got["a"] - got["c"])
    # ordering runs
    assert [r["name"] for r in spatially_ordered(df, "lon", "lat").collect()][0] in {
        "c", "a", "b"
    }


def test_geocode_cascade_cache_prepass(spark):
    df = spark.createDataFrame(
        [("1 rue de Rivoli Paris",), ("2 rue X Lyon",), ("3 rue Y Nantes",)],
        "address string",
    )
    cache = spark.createDataFrame(
        [("1 rue de Rivoli Paris", 2.35, 48.85, 0.99, "cache")],
        "address string, lon double, lat double, geo_score double, geo_source string",
    )
    out = geocode_cascade(df, "address", cache=cache)
    rows = {r["address"]: r for r in out.collect()}
    assert len(rows) == 3
    # cache hit keeps the cached source; misses get geocoded
    assert rows["1 rue de Rivoli Paris"]["geo_source"] == "cache"
    assert rows["2 rue X Lyon"]["geo_source"] == "ban-fake"
    assert rows["2 rue X Lyon"]["lon"] is not None
    # deterministic fake: same address -> same coords across runs
    out2 = {r["address"]: r for r in geocode_cascade(df, "address", cache=cache).collect()}
    assert out2["3 rue Y Nantes"]["lon"] == rows["3 rue Y Nantes"]["lon"]


def test_extract_media_metadata(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00" * 1000)), (2, bytearray(b"\x01" * 2500))],
        "media_id long, content binary",
    )
    out = extract_media_metadata(df, "media_id", "content", "image")
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 1000 and rows[2]["n_bytes"] == 2500
    assert rows[1]["media_type"] == "image"
    assert rows[1]["decode_status"] == "fake-decoded"
    assert len(rows[1]["sha"]) == 64


def test_check_urls(spark):
    df = spark.createDataFrame([("http://a",), ("http://b",)], "url string")
    out = {r["url"]: r for r in check_urls(df, "url").collect()}
    assert set(out) == {"http://a", "http://b"}
    assert all(isinstance(r["ok"], bool) for r in out.values())
