"""Sink writers (SURVEY §2.1 S15-S22 + §2.9 ST2/ST3 idempotence).

Scale posture: parquet+zstd partitioned tables are the engine's native sink;
CSV/JSON "publish" sinks are deliberate single-file coalesce steps at the end
of a pipeline (small outputs), mirroring the reference's dual CSV+Parquet
publication (rna/task_functions.py:96-112).
"""

from __future__ import annotations

import glob
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """S16: parquet sink, zstd (utils/conversions.py:8-36)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_date_partition(
    df: DataFrame, path: str, partition_col: str, compression: str = "zstd"
) -> None:
    """ST2: idempotent date-partition rewrite — replace ONLY the partitions
    present in ``df`` (dynamic partition overwrite), the Spark equivalent of
    the reference's delete-dates-then-insert reprocessing safety
    (dgv/metrics/task.py:200-221, remove_visit_metrics.sql).
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", compression)
        .partitionBy(partition_col)
        .parquet(path)
    )


def _recover_swap_state(path: str, tmp_suffix: str = "__tmp_swap") -> None:
    """Repair the rename-swap sink layout before reuse.

    The two-rename swap (``path`` -> ``__old``, ``__tmp_swap`` -> ``path``)
    has a non-atomic window: a crash between the renames leaves the data
    only under ``__old``; a crash during the tmp write leaves a stale
    ``__tmp_swap``. Roll the former forward (restore ``__old`` as current)
    and drop the latter so a retry starts clean. For genuinely atomic
    publishes use the generation-directory + _CURRENT pointer layout
    (orchestration/rollup.py), which readers follow through one atomic
    pointer rename.
    """
    tmp = path.rstrip("/") + tmp_suffix
    old = path.rstrip("/") + "__old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)


def merge_upsert_accumulate(
    spark,
    updates: DataFrame,
    path: str,
    keys: list[str],
    accumulate_cols: list[str],
) -> None:
    """ST3: upsert-accumulate — ``INSERT ... ON CONFLICT DO UPDATE SET
    x = old.x + new.x`` (dgv/tabular_metrics/task_functions.py:167-172),
    without Delta: read current state, full-outer join on keys, sum the
    accumulate columns, atomically swap the table directory.

    At 100 TB this is a partition-scoped operation (only touched partitions
    are rewritten); with a Delta/Iceberg catalog it becomes a single MERGE.
    """
    _recover_swap_state(path)
    exists = bool(glob.glob(os.path.join(path, "*.parquet"))) or bool(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    if not exists:
        write_parquet(updates, path)
        return
    current = spark.read.parquet(path)
    merged = current.alias("c").join(updates.alias("u"), on=keys, how="full")
    out_cols = [F.col(k) for k in keys]
    for c in accumulate_cols:
        out_cols.append(
            (
                F.coalesce(F.col(f"c.{c}"), F.lit(0))
                + F.coalesce(F.col(f"u.{c}"), F.lit(0))
            ).alias(c)
        )
    passthrough = [
        c for c in current.columns if c not in keys and c not in accumulate_cols
    ]
    for c in passthrough:
        out_cols.append(F.coalesce(F.col(f"u.{c}"), F.col(f"c.{c}")).alias(c))
    result = merged.select(*out_cols)
    tmp = path.rstrip("/") + "__tmp_swap"
    write_parquet(result, tmp)
    old = path.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def publish_single_csv(
    df: DataFrame, path: str, sep: str = ",", compression: str | None = None
) -> str:
    """S15/S18: single-file CSV publish (header once) — the export step that
    the reference does with incremental ``to_csv(mode="a")``
    (insee/deces/task_functions.py:188-194). coalesce(1) is intentional:
    publish outputs are small end products, never intermediate data.
    Returns the final file path."""
    tmp = path + "__spark_tmp"
    w = df.coalesce(1).write.mode("overwrite").option("header", "true").option("sep", sep)
    if compression:
        w = w.option("compression", compression)
    w.csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*"))[0]
    if os.path.exists(path):
        os.remove(path)
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_json_records(df: DataFrame, path: str) -> None:
    """S20: JSON-records sink (to_json(orient="records") equivalent)."""
    df.write.mode("overwrite").json(path)


def write_geoparquet_points(
    df: DataFrame,
    path: str,
    lon_col: str,
    lat_col: str,
    compression: str = "zstd",
    row_group_rows: int = 20_000,
    curve: str = "hilbert",
    geo_metadata: bool = True,
) -> None:
    """S17: GeoParquet point sink (utils/conversions.py:65-142).

    Reproduces the reference's DuckDB-spatial output Spark-side, without
    Sedona:
    - per-row ``bbox`` struct (xmin/ymin/xmax/ymax — degenerate for points);
    - rows ordered along a space-filling curve (true Hilbert by default,
      matching ST_Hilbert at conversions.py:105; ``curve='morton'`` for the
      cheaper z-order) so parquet row-group min/max stats prune spatial
      queries;
    - zstd compression, bounded row groups (20k, conversions.py:74);
    - with ``geo_metadata`` (default), a post-write pyarrow pass appends a
      WKB point ``geometry`` column and the GeoParquet 1.0.0 ``geo`` footer
      (version, primary_column, per-file bbox, CRS84) so geo tools
      (GeoPandas, QGIS, DuckDB spatial) read the output natively.

    The footer pass is a driver-side loop over output part-files — publish
    outputs are few files by design; for massive spatial tables run the
    same function per partition directory, or distribute the rewrite with
    mapInPandas over the file list (the per-file logic is identical).
    """
    from datagouvfr_data_pipelines_spark.functions.geo import (
        bbox_struct,
        spatially_ordered,
    )

    ordered = spatially_ordered(
        df.withColumn("bbox", bbox_struct(lon_col, lat_col)),
        lon_col, lat_col, curve=curve,
    )
    (
        ordered.write.mode("overwrite")
        .option("compression", compression)
        .option("parquet.block.size", str(row_group_rows * 256))
        .parquet(path)
    )
    if geo_metadata:
        for part in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
            _add_geoparquet_footer(part, lon_col, lat_col, compression, row_group_rows)


def _wkb_point(lon: float, lat: float) -> bytes:
    """Little-endian WKB for a 2D point: byte order 01, type 00000001,
    x float64, y float64 (the encoding GeoParquet mandates)."""
    import struct as _struct

    return b"\x01\x01\x00\x00\x00" + _struct.pack("<dd", lon, lat)


def _add_geoparquet_footer(
    file_path: str, lon_col: str, lat_col: str, compression: str,
    row_group_rows: int = 20_000,
) -> None:
    """Rewrite one parquet file with a WKB ``geometry`` column + GeoParquet
    1.0.0 ``geo`` file metadata (what DuckDB spatial's write_parquet emits,
    reference utils/conversions.py:65-142)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(file_path)
    lons = t.column(lon_col).to_pylist()
    lats = t.column(lat_col).to_pylist()
    geom = pa.array(
        [
            None if lo is None or la is None else _wkb_point(lo, la)
            for lo, la in zip(lons, lats)
        ],
        type=pa.binary(),
    )
    t = t.append_column("geometry", geom)
    valid = [(lo, la) for lo, la in zip(lons, lats) if lo is not None and la is not None]
    bbox = (
        [
            min(p[0] for p in valid), min(p[1] for p in valid),
            max(p[0] for p in valid), max(p[1] for p in valid),
        ]
        if valid
        else [0.0, 0.0, 0.0, 0.0]
    )
    geo = {
        "version": "1.0.0",
        "primary_column": "geometry",
        "columns": {
            "geometry": {
                "encoding": "WKB",
                "geometry_types": ["Point"],
                "bbox": bbox,
                # null CRS = OGC:CRS84 per the GeoParquet spec, which is
                # what lon/lat data.gouv publications are in
                "crs": None,
            }
        },
    }
    meta = dict(t.schema.metadata or {})
    meta[b"geo"] = json.dumps(geo).encode()
    t = t.replace_schema_metadata(meta)
    # keep the bounded row groups the Spark write produced — pyarrow's
    # default (1Mi rows/group) would destroy the per-group min/max pruning
    # the Hilbert ordering exists for
    pq.write_table(t, file_path, compression=compression, row_group_size=row_group_rows)
    # the rewrite invalidates Hadoop LocalFS checksum sidecars — drop them
    # or a later spark.read fails with ChecksumException
    crc = os.path.join(
        os.path.dirname(file_path), "." + os.path.basename(file_path) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)


def geojson_feature_collection(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    property_cols: list[str],
    order_by: list[str] | None = None,
) -> str:
    """S20: GeoJSON FeatureCollection assembly
    (schema/irve/geo_utils/geo.py:69-96): build features as structs
    JVM-side, aggregate to one JSON document. Driver only sees the final
    string — property structs and to_json run distributed.

    Feature order is made deterministic (publish artifacts must be
    bit-identical run to run): features are collected as (key, json)
    structs and array_sort-ed on ``order_by`` (default: lon, lat, then the
    property columns) before concatenation — collect_list alone returns
    partition-arrival order."""
    order_cols = order_by if order_by is not None else [lon_col, lat_col, *property_cols]
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col(lon_col), F.col(lat_col)).alias("coordinates"),
        ).alias("geometry"),
        F.struct(*[F.col(c) for c in property_cols]).alias("properties"),
    )
    keyed = F.struct(
        F.struct(*[F.col(c) for c in order_cols]).alias("k"),
        F.to_json(feature).alias("fj"),
    )
    collected = (
        df.select(keyed.alias("s"))
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(
            F.concat_ws(",", F.transform("ss", lambda s: s["fj"])).alias("features")
        )
    )
    row = collected.collect()[0]
    return '{"type": "FeatureCollection", "features": [' + row["features"] + "]}"


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """ORC sink (zstd) — parity with the parquet sink for Hive-era lakes."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def publish_dataset(
    df: DataFrame,
    out_dir: str,
    name: str,
    formats: tuple[str, ...] = ("parquet", "csv"),
    compression: str = "zstd",
) -> dict:
    """Dataset publication bundle: the reference uploads each end product
    to data.gouv with resource metadata (utils/datagouv.py publication
    flow); engine-side that is a directory of formats plus a MANIFEST the
    downstream catalog can trust:

        <out_dir>/<name>.parquet/   distributed parquet (zstd)
        <out_dir>/<name>.csv        single-file CSV (when requested)
        <out_dir>/<name>.manifest.json
            {name, n_rows, columns: [{name, type}], files:
             [{path, bytes, sha256 (single files only)}], published_at}

    Row count comes from ONE count() action; checksums cover the
    single-file artifacts (a sha over a multi-part parquet dir is
    meaningless — its integrity is per-file parquet CRC). Returns the
    manifest dict. The HTTP upload stays a driver-side connector
    (publish_to_object_store / datagouv client) by design.
    """
    import hashlib
    import json as _json
    import time as _time

    os.makedirs(out_dir, exist_ok=True)
    n_rows = df.count()
    files = []
    if "parquet" in formats:
        pq_path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").option("compression", compression).parquet(pq_path)
        nbytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(pq_path)
            for f in fs
        )
        files.append({"path": pq_path, "bytes": nbytes, "sha256": None})
    if "csv" in formats:
        csv_path = publish_single_csv(df, os.path.join(out_dir, f"{name}.csv"))
        h = hashlib.sha256()
        with open(csv_path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        files.append(
            {
                "path": csv_path,
                "bytes": os.path.getsize(csv_path),
                "sha256": h.hexdigest(),
            }
        )
    manifest = {
        "name": name,
        "n_rows": n_rows,
        "columns": [
            {"name": f.name, "type": f.dataType.simpleString()}
            for f in df.schema.fields
        ],
        "files": files,
        "published_at": _time.time(),
    }
    mpath = os.path.join(out_dir, f"{name}.manifest.json")
    tmp = mpath + ".__tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        _json.dump(manifest, f, indent=2)
    os.replace(tmp, mpath)
    return manifest
