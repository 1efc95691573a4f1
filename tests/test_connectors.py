"""Connector boundary: object-store publish (file:// path), gating."""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark.io.connectors import (
    LocalDirTransport,
    publish_to_object_store,
    sftp_land_and_read,
)


def test_publish_to_object_store_file_scheme(spark, tmp_path):
    src = tmp_path / "artifact.csv"
    src.write_text("a,b\n1,2\n")
    dest = f"file://{tmp_path}/published/artifact.csv"
    out = publish_to_object_store(spark, str(src), dest)
    assert out == dest
    assert (tmp_path / "published" / "artifact.csv").read_text() == "a,b\n1,2\n"
    # overwrite republish
    src.write_text("a,b\n9,9\n")
    publish_to_object_store(spark, str(src), dest)
    assert (tmp_path / "published" / "artifact.csv").read_text() == "a,b\n9,9\n"
    # overwrite=False refuses
    with pytest.raises(FileExistsError):
        publish_to_object_store(spark, str(src), dest, overwrite=False)


def test_sftp_gated(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="paramiko"):
        sftp_land_and_read(
            spark, "/remote", "*.csv", str(tmp_path / "land"),
            reader=lambda s, d: None, host="example.invalid",
        )


def test_sftp_land_and_read_idempotent(spark, tmp_path):
    remote = tmp_path / "remote"
    remote.mkdir()
    (remote / "d1.csv").write_text("k,v\n1,a\n")
    (remote / "d2.csv").write_text("k,v\n2,b\n")
    (remote / "skip.txt").write_text("not matched")
    landing = str(tmp_path / "land")

    def reader(s, paths):
        return s.read.option("header", "true").csv(paths)

    t = LocalDirTransport(str(remote))
    df = sftp_land_and_read(spark, str(remote), "*.csv", landing, reader, transport=t)
    assert sorted(r["k"] for r in df.collect()) == ["1", "2"]

    # second drain: already-landed names are NOT re-downloaded
    calls = []
    orig_get = t.get
    t.get = lambda rp, lp: (calls.append(rp), orig_get(rp, lp))
    df2 = sftp_land_and_read(spark, str(remote), "*.csv", landing, reader, transport=t)
    assert calls == []
    assert sorted(r["k"] for r in df2.collect()) == ["1", "2"]

    # a NEW remote file is picked up on the next drain
    (remote / "d3.csv").write_text("k,v\n3,c\n")
    df3 = sftp_land_and_read(spark, str(remote), "*.csv", landing, reader, transport=t)
    assert sorted(r["k"] for r in df3.collect()) == ["1", "2", "3"]

    # stale landed files from other patterns are NOT handed to the reader
    (remote / "other.tsv").write_text("x\t9\n")
    sftp_land_and_read(
        spark, str(remote), "*.tsv", landing,
        reader=lambda s, paths: paths, transport=t,
    )
    got_paths = sftp_land_and_read(
        spark, str(remote), "*.csv", landing,
        reader=lambda s, paths: paths, transport=t,
    )
    assert all(p.endswith(".csv") for p in got_paths) and len(got_paths) == 3
