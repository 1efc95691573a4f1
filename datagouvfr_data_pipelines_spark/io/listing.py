"""S13: object/file listing via the Hadoop FileSystem API.

The reference paginates S3 prefix listings manually (>1000 keys,
utils/s3.py:124-148). Spark-side, input discovery is normally just a glob in
the read path; this helper exists for the cases where the listing itself is
the data (ledger diffs, retention sweeps, arrival detection) — it uses the
JVM Hadoop FS so the same code lists local paths, HDFS and s3a.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class FileEntry:
    path: str
    size: int
    modification_time: int  # epoch millis
    is_dir: bool


def list_files(
    spark: SparkSession, path: str, glob: str | None = None, recursive: bool = False
) -> list[FileEntry]:
    """List files under ``path`` (optionally glob-filtered / recursive)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path if glob is None else f"{path}/{glob}")
    fs = hpath.getFileSystem(conf)
    out: list[FileEntry] = []
    if glob is not None:
        statuses = fs.globStatus(hpath) or []
        for st in statuses:
            out.append(
                FileEntry(
                    st.getPath().toString(), st.getLen(),
                    st.getModificationTime(), st.isDirectory(),
                )
            )
        return out
    it = fs.listFiles(hpath, recursive)
    while it.hasNext():
        st = it.next()
        out.append(
            FileEntry(
                st.getPath().toString(), st.getLen(),
                st.getModificationTime(), False,
            )
        )
    return out


def files_as_dataframe(spark: SparkSession, entries: list[FileEntry]) -> DataFrame:
    """Lift a listing into a DataFrame for ledger joins (U4 membership
    split against a processed-files table)."""
    return spark.createDataFrame(
        [(e.path, e.size, e.modification_time) for e in entries],
        "path string, size long, modification_time long",
    )
