"""Connector boundary: object-store publish (file:// path), gating."""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark.io.connectors import (
    publish_to_object_store,
    read_sftp,
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


def test_sftp_gated():
    with pytest.raises(NotImplementedError, match="paramiko"):
        read_sftp()
