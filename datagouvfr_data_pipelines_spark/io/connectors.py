"""External-system connectors (SURVEY §2.1 rows S8/S12/S14/S19/S22).

These sit at the engine boundary: driver-side fetches that land data into
DataFrames, and publish steps that move finished artifacts to object
storage. Network-dependent pieces are import-gated; the object-store mover
uses the Hadoop FileSystem API so the SAME code path serves file://, hdfs://
and s3a:// — tested locally against file://.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S12: Postgres/JDBC scan. With a ``partition_column`` + bounds the
    read parallelizes across ``num_partitions`` executor connections —
    REQUIRED for any large table (a single-connection read is a driver
    bottleneck). Replaces utils/postgres.py:23-29 execute_query."""
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        # Spark rejects `query` + `partitionColumn` together; the partitioned
        # form must go through `dbtable` as a derived table so each executor
        # connection appends its own bound predicate.
        reader = (
            reader.option("dbtable", f"({query}) spark_src")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    else:
        reader = reader.option("query", query)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append",
    batch_size: int = 10_000, properties: dict[str, str] | None = None,
) -> None:
    """S19: batched JDBC bulk sink (COPY-equivalent throughput needs the
    driver's ``reWriteBatchedInserts=true`` for Postgres)."""
    w = (
        df.write.format("jdbc").mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        w = w.option(k, v)
    w.save()


def publish_to_object_store(
    spark: SparkSession, local_path: str, dest_url: str, overwrite: bool = True
) -> str:
    """S22: move a finished artifact to object storage (utils/s3.py:59-90
    send_file). Uses Hadoop FS so dest may be file://, hdfs:// or s3a://;
    ACL/content-type policy belongs to bucket configuration, not the engine.
    Returns the destination URL."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path("file://" + local_path)
    dst = jvm.org.apache.hadoop.fs.Path(dest_url)
    fs = dst.getFileSystem(conf)
    parent = dst.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    if fs.exists(dst):
        if not overwrite:
            raise FileExistsError(dest_url)
        fs.delete(dst, False)
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        src.getFileSystem(conf), src, fs, dst, False, conf
    )
    return dest_url


def fetch_url_to_dataframe(
    spark: SparkSession, url: str, fmt: str = "json", schema=None, timeout: int = 60
):
    """S7/S8: driver-side HTTP/SPARQL fetch landed as a DataFrame — the
    paginated API generator (utils/datagouv.py:134-151) collapsed to one
    snapshot read. Gated on ``requests``; large payloads should land to
    storage first and go through spark.read instead."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("fetch_url_to_dataframe needs requests") from e

    resp = requests.get(url, timeout=timeout)
    resp.raise_for_status()
    if fmt == "json":
        data = resp.json()
        if isinstance(data, dict):
            data = [data]
        df = spark.createDataFrame(data, schema=schema)
        return df
    raise ValueError(f"unsupported fmt {fmt}")


def sftp_land_and_read(
    spark: SparkSession,
    remote_dir: str,
    pattern: str,
    landing_dir: str,
    reader,
    transport=None,
    host: str | None = None,
    credentials: dict[str, str] | None = None,
) -> DataFrame:
    """S14: SFTP ingest = land-then-read (utils/sftp.py:17-57).

    The engine's SFTP posture: the remote server is a SOURCE OF FILES, not
    a queryable system — so the connector lists the remote directory,
    downloads matching files to ``landing_dir`` (skipping names already
    landed: re-runs are idempotent, the ledger is the landing dir itself),
    and hands THE LANDED PATHS (this drain's matches only — stale files
    from earlier drains with other patterns are excluded) to
    ``reader(spark, paths)`` — any engine reader accepts a path list
    (CSV/parquet/XML/archive). Downloads are driver-side by design (SFTP
    is a single-server protocol; parallelism beyond a few connections
    DDoSes the source, the reference uses one).

    ``transport`` abstracts the wire protocol: an object with
    ``listdir(remote_dir) -> list[str]`` and ``get(remote_path,
    local_path)``. Default builds a paramiko SFTP client from ``host`` +
    ``credentials`` (gated: paramiko is not in this container); tests
    inject a local-directory transport to exercise the landing logic.
    """
    import fnmatch
    import os
    import shutil

    if transport is None:
        try:
            import paramiko
        except ImportError as e:
            raise NotImplementedError(
                "sftp_land_and_read needs paramiko (or an injected transport); "
                "land files to object storage instead"
            ) from e
        t = paramiko.Transport((host, int((credentials or {}).get("port", 22))))
        t.connect(
            username=(credentials or {}).get("user"),
            password=(credentials or {}).get("password"),
        )
        transport = paramiko.SFTPClient.from_transport(t)

    os.makedirs(landing_dir, exist_ok=True)
    landed = []
    for name in sorted(transport.listdir(remote_dir)):
        if not fnmatch.fnmatch(name, pattern):
            continue
        dest = os.path.join(landing_dir, name)
        if not os.path.exists(dest):
            tmp = dest + ".__part"
            transport.get(os.path.join(remote_dir, name), tmp)
            shutil.move(tmp, dest)  # atomic publish into the ledger dir
        landed.append(dest)
    return reader(spark, landed)


class LocalDirTransport:
    """Filesystem-backed transport implementing the SFTP client surface
    (listdir/get) — the test double for ``sftp_land_and_read``, and a
    useful tool in its own right for landing from mounted shares."""

    def __init__(self, root: str | None = None):
        self.root = root

    def listdir(self, remote_dir: str) -> list[str]:
        import os

        return os.listdir(remote_dir if self.root is None else self.root)

    def get(self, remote_path: str, local_path: str) -> None:
        import os
        import shutil

        src = (
            remote_path
            if self.root is None
            else os.path.join(self.root, os.path.basename(remote_path))
        )
        shutil.copyfile(src, local_path)


class FtpTransport:
    """Plain-FTP transport for ``sftp_land_and_read`` built on stdlib
    ``ftplib`` — NO optional dependency, so the S14 land-and-read flow is
    executable out of the box against any FTP source (the reference pulls
    Meteo-France archives over FTP). Same two-method surface as the
    paramiko client: ``listdir`` / ``get``.
    """

    def __init__(
        self,
        host: str,
        user: str = "anonymous",
        password: str = "",
        port: int = 21,
        timeout: int = 60,
        ftp_factory=None,
    ):
        import ftplib

        factory = ftp_factory or ftplib.FTP
        self.ftp = factory()
        self.ftp.connect(host, port, timeout=timeout)
        self.ftp.login(user, password)

    def listdir(self, remote_dir: str) -> list[str]:
        import posixpath

        return [posixpath.basename(p) for p in self.ftp.nlst(remote_dir)]

    def get(self, remote_path: str, local_path: str) -> None:
        with open(local_path, "wb") as f:
            self.ftp.retrbinary(f"RETR {remote_path}", f.write)

    def close(self) -> None:
        self.ftp.quit()


def read_sftp(*args, **kwargs):  # pragma: no cover
    """S14 legacy alias: see ``sftp_land_and_read`` (the executable path).
    Direct no-transport calls stay gated on paramiko."""
    return sftp_land_and_read(*args, **kwargs)
