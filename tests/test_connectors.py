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


DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


def _skip_or_fail_no_derby():
    """The Derby driver ships inside pyspark's own jars/ directory
    (derby*.jar, pulled in for the Hive metastore), so in any stock pyspark
    install this test runs. If the classpath was stripped, skip by default,
    but fail loudly under SPARK_GRAFT_REQUIRE_JDBC=1 so CI can't silently
    lose S12/S19 coverage."""
    import glob
    import os

    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby*.jar"))
    msg = (
        "Derby driver not on Spark classpath. pyspark's jars dir "
        f"{'contains' if jars else 'is MISSING'} derby*.jar ({jars}); "
        "restore the stock pyspark jars/ directory or pass "
        "spark.driver.extraClassPath pointing at derby.jar+derbytools.jar."
    )
    if os.environ.get("SPARK_GRAFT_REQUIRE_JDBC") == "1":
        pytest.fail(msg)
    pytest.skip(msg)


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S12/S19 executable check: write a table through the batched JDBC sink
    and read it back through the partitioned JDBC scan, against the Derby
    embedded engine that ships on Spark's classpath (no server needed).
    Verifies the partitioned read really fans out to num_partitions
    executor-side connections with bound predicates."""
    from datagouvfr_data_pipelines_spark.io.connectors import read_jdbc, write_jdbc

    if not _derby_available(spark):
        _skip_or_fail_no_derby()
    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    df = spark.range(0, 100).selectExpr(
        "CAST(id AS INT) AS id", "CAST(id % 7 AS INT) AS grp"
    )
    write_jdbc(df, url, "items", mode="overwrite", properties=DERBY_PROPS)

    back = read_jdbc(
        spark,
        url,
        'SELECT "id", "grp" FROM items WHERE "grp" < 5',
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        properties=DERBY_PROPS,
    )
    assert back.rdd.getNumPartitions() == 4
    rows = sorted((r.id, r.grp) for r in back.collect())
    assert rows == [(i, i % 7) for i in range(100) if i % 7 < 5]

    # unpartitioned single-connection path (query option)
    one = read_jdbc(spark, url, 'SELECT COUNT(*) AS "n" FROM items', properties=DERBY_PROPS)
    assert one.collect()[0].n == 100

    # append mode accumulates
    write_jdbc(df.limit(5), url, "items", mode="append", properties=DERBY_PROPS)
    two = read_jdbc(spark, url, 'SELECT COUNT(*) AS "n" FROM items', properties=DERBY_PROPS)
    assert two.collect()[0].n == 105


def test_ftp_transport_lands_via_fake_server(spark, tmp_path):
    """FtpTransport drives the same land-and-read flow over stdlib ftplib:
    a fake FTP object verifies the nlst/retrbinary protocol mapping, no
    network needed."""
    from datagouvfr_data_pipelines_spark.io.connectors import (
        FtpTransport,
        sftp_land_and_read,
    )

    payload = b"a;b\n1;2\n"

    class FakeFTP:
        def connect(self, host, port, timeout=None):
            assert host == "ftp.example.test"

        def login(self, user, password):
            self.user = user

        def nlst(self, remote_dir):
            return [remote_dir + "/data1.csv", remote_dir + "/skip.txt"]

        def retrbinary(self, cmd, cb):
            assert cmd.startswith("RETR ") and cmd.endswith("data1.csv")
            cb(payload)

        def quit(self):
            pass

    t = FtpTransport("ftp.example.test", ftp_factory=FakeFTP)
    landing = str(tmp_path / "landed")

    def reader(sp, paths):
        return sp.read.option("sep", ";").option("header", True).csv(paths)

    df = sftp_land_and_read(spark, "/pub", "*.csv", landing, reader, transport=t)
    assert df.count() == 1
    assert df.columns == ["a", "b"]
    t.close()


def test_paged_api_datasource_partitioned_read(spark, tmp_path):
    """Spark 4 Python DataSource: pages become InputPartitions (parallel
    fetch), urllib speaks file:// so the production code path runs with no
    network. Covers envelope unwrapping, page blocking, and null fill for
    missing keys."""
    import json as jsonmod

    from datagouvfr_data_pipelines_spark.io.rest_datasource import (
        register_paged_api,
    )

    api = tmp_path / "api"
    api.mkdir()
    # 5 pages of 2 records wrapped in a data.gouv-style envelope
    for p in range(5):
        recs = [
            {"id": p * 2 + i, "name": f"rec-{p}-{i}"} for i in range(2)
        ]
        if p == 4:
            recs[1].pop("name")  # missing key -> NULL
        (api / f"page-{p}.json").write_text(
            jsonmod.dumps({"data": recs, "next_page": p + 1})
        )

    register_paged_api(spark)
    df = (
        spark.read.format("paged_api")
        .schema("id BIGINT, name STRING")
        .option("url", f"file://{api}/page-{{page}}.json")
        .option("pages", 5)
        .option("data_path", "data")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 10
    assert {r["id"] for r in rows} == set(range(10))
    assert [r["name"] for r in rows if r["id"] == 9] == [None]
    # one task per page by default; blocked -> ceil(5/2) partitions
    assert df.rdd.getNumPartitions() == 5
    blocked = (
        spark.read.format("paged_api")
        .schema("id BIGINT, name STRING")
        .option("url", f"file://{api}/page-{{page}}.json")
        .option("pages", 5)
        .option("pages_per_partition", 2)
        .option("data_path", "data")
        .load()
    )
    assert blocked.rdd.getNumPartitions() == 3
    assert blocked.count() == 10


def test_paged_api_stream_incremental_pages(spark, tmp_path):
    """Streaming paged_api: the checkpointed offset is the next unread
    page — a second drain after new pages land emits ONLY the new rows."""
    import json as jsonmod

    from datagouvfr_data_pipelines_spark.io.rest_datasource import (
        register_paged_api,
    )

    api = tmp_path / "feed"
    api.mkdir()

    def land(p, recs):
        (api / f"page-{p}.json").write_text(jsonmod.dumps({"data": recs}))

    land(0, [{"id": 0}, {"id": 1}])
    land(1, [{"id": 2}])

    register_paged_api(spark)
    stream = (
        spark.readStream.format("paged_api")
        .schema("id BIGINT")
        .option("url", f"file://{api}/page-{{page}}.json")
        .option("data_path", "data")
        .load()
    )
    emitted = []

    def drain():
        q = (
            stream.writeStream.foreachBatch(
                lambda b, i: emitted.extend(r["id"] for r in b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    assert sorted(emitted) == [0, 1, 2]
    land(2, [{"id": 3}, {"id": 4}])
    drain()
    assert sorted(emitted) == [0, 1, 2, 3, 4]  # no re-emission of pages 0-1
