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
