"""GeoParquet-style sink (S17) and spam scoring (F4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.text import spam_score
from datagouvfr_data_pipelines_spark.io.writers import write_geoparquet_points


def test_write_geoparquet_points(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("paris", 2.35, 48.85),
            ("lyon", 4.84, 45.76),
            ("lille", 3.06, 50.63),
            ("nice", 7.27, 43.70),
        ],
        "name string, lon double, lat double",
    )
    path = str(tmp_path / "geo")
    write_geoparquet_points(df, path, "lon", "lat")
    back = spark.read.parquet(path)
    rows = {r["name"]: r for r in back.collect()}
    assert set(rows) == {"paris", "lyon", "lille", "nice"}
    b = rows["paris"]["bbox"]
    # degenerate point bbox: xmin==xmax==lon
    assert b["xmin"] == b["xmax"] == 2.35 and b["ymin"] == 48.85


def test_geoparquet_footer_and_wkb(spark, tmp_path):
    import glob
    import json
    import struct

    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [("paris", 2.35, 48.85), ("lyon", 4.84, 45.76)],
        "name string, lon double, lat double",
    )
    path = str(tmp_path / "geo2")
    write_geoparquet_points(df, path, "lon", "lat")
    parts = glob.glob(path + "/part-*.parquet")
    assert parts
    t = pq.read_table(parts[0])
    geo = json.loads(t.schema.metadata[b"geo"])
    assert geo["version"] == "1.0.0"
    assert geo["primary_column"] == "geometry"
    col = geo["columns"]["geometry"]
    assert col["encoding"] == "WKB" and col["geometry_types"] == ["Point"]
    assert col["bbox"] == [2.35, 45.76, 4.84, 48.85]
    # decode the WKB point and cross-check against the lon/lat columns
    names = t.column("name").to_pylist()
    wkbs = t.column("geometry").to_pylist()
    lons = t.column("lon").to_pylist()
    for name, wkb, lon in zip(names, wkbs, lons):
        assert wkb[:5] == b"\x01\x01\x00\x00\x00"
        x, y = struct.unpack("<dd", wkb[5:21])
        assert x == lon


def test_hilbert_key_parity_and_ordering(spark):
    from datagouvfr_data_pipelines_spark.functions.geo import hilbert_key

    def xy2d(order, x, y):
        d = 0
        s = order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (2.35, 48.85),
           (-73.99, 40.71), (151.2, -33.87)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for r in df.select("lon", "lat", hilbert_key("lon", "lat").alias("h")).collect():
        xi = min(max(int((r["lon"] + 180) / 360 * 65535), 0), 65535)
        yi = min(max(int((r["lat"] + 90) / 180 * 65535), 0), 65535)
        assert r["h"] == xy2d(1 << 16, xi, yi), (r["lon"], r["lat"])


def test_spam_score(spark):
    df = spark.createDataFrame(
        [
            (1, "gagnez au casino avec crypto et forex maintenant"),
            (2, "rapport annuel des finances publiques locales"),
            (3, "CASINO Crypto"),  # case-insensitive
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["s"] for r in df.select("doc_id", spam_score("text").alias("s")).collect()}
    assert out[1] == 3 / 8
    assert out[2] == 0.0
    assert out[3] == 1.0
