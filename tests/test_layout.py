"""Layout maintenance: small-file compaction, Z-order clustering (min/max
skipping effect measured from real parquet footers), ORC round-trip."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.io.layout import (
    compact_parquet_dir,
    zorder_write,
)


def _file_spans(path: str, col: str) -> list[float]:
    """Per-parquet-file (max - min) width of ``col`` from footer stats."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append(max(maxs) - min(mins))
    return spans


def test_compact_parquet_dir(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(40).write.parquet(src)
    n_small = len(glob.glob(os.path.join(src, "*.parquet")))
    assert n_small >= 40
    n_out = compact_parquet_dir(spark, src, dst, target_file_bytes=64 << 20)
    assert n_out < n_small
    assert spark.read.parquet(dst).count() == li.count()


def test_zorder_write_tightens_file_spans(spark, sf_dir, tmp_path):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_quantity")
    )
    base = str(tmp_path / "plain")
    zed = str(tmp_path / "zorder")
    n_files = 8
    li.repartition(n_files).write.parquet(base)
    zorder_write(li, zed, ["l_extendedprice", "l_quantity"], bits=8,
                 n_files=n_files)
    assert spark.read.parquet(zed).count() == li.count()
    # clustered files must cover FAR tighter value ranges on BOTH columns
    # than a hash layout — that tightness is exactly what min/max file
    # skipping prunes on
    for col in ("l_extendedprice", "l_quantity"):
        plain_spans = _file_spans(base, col)
        z_spans = _file_spans(zed, col)
        if len(z_spans) < 2:
            continue  # degenerate single-file layout proves nothing
        avg_plain = sum(plain_spans) / len(plain_spans)
        avg_z = sum(z_spans) / len(z_spans)
        assert avg_z < avg_plain * 0.7, (col, avg_z, avg_plain)
    # and the data still answers predicates correctly after clustering
    lo = li.approxQuantile("l_extendedprice", [0.4], 0.01)[0]
    hi = li.approxQuantile("l_extendedprice", [0.6], 0.01)[0]
    got = (
        spark.read.parquet(zed)
        .where(F.col("l_extendedprice").between(lo, hi))
        .count()
    )
    want = li.where(F.col("l_extendedprice").between(lo, hi)).count()
    assert got == want


def test_zorder_key_rejects_overflow(spark, sf_dir):
    import pytest

    from datagouvfr_data_pipelines_spark.io.layout import zorder_key

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError):
        zorder_key(li, ["l_quantity"] * 8, bits=8)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from datagouvfr_data_pipelines_spark.io.readers import read_orc
    from datagouvfr_data_pipelines_spark.io.writers import write_orc

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )
    assert back.schema == nation.schema
