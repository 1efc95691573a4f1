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
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
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


def read_sftp(*args, **kwargs):  # pragma: no cover
    """S14: FTP/SFTP ingest (utils/sftp.py:17-57). Gated: paramiko is not in
    this container; production deploys land files to object storage and use
    the normal readers."""
    raise NotImplementedError("read_sftp needs paramiko; land files to storage instead")
