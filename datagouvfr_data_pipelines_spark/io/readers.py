"""Source readers (SURVEY §2.1 S1-S14).

Posture: always explicit ``StructType`` — never ``inferSchema`` (the
reference is defensively stringly-typed at ingest, SURVEY §1.2; we type at
the boundary instead). All readers return plain DataFrames so Catalyst keeps
pushdown/pruning; file listing is the cluster's job (globs), not a driver
loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = ",",
    encoding: str = "UTF-8",
    header: bool = True,
    null_values: list[str] | None = None,
    keep_default_na: bool = True,
    capture_corrupt: bool = False,
) -> DataFrame:
    """S1/S2: typed CSV scan (gzip transparent via codec detection).

    Mirrors the reference's read_csv contract (dvf/explore/task_functions.py
    :455-465: dtype/sep/encoding/na_values) — including the Namibia guard:
    ``keep_default_na=False`` stops "NA" from becoming NULL
    (geozones/task_functions.py:336-345).

    ``capture_corrupt=True`` appends a ``_corrupt_record`` column holding the
    raw line for rows that fail the typed parse (PERMISSIVE mode otherwise
    nulls bad fields SILENTLY — at ingest scale you want the reject lines
    routed to a quarantine sink, not vanished). Clean rows have NULL there.
    """
    from pyspark.sql.types import StringType, StructField

    if capture_corrupt:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        schema = StructType(
            list(schema.fields) + [StructField("_corrupt_record", StringType())]
        )
    reader = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if capture_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    if null_values:
        # Spark CSV has a single nullValue; emptyValue covers ''. Multiple
        # markers are normalized post-read (column expression, still pushed
        # into the same stage).
        reader = reader.option("nullValue", null_values[0])
    if not keep_default_na:
        reader = reader.option("nullValue", "\x00")  # never matches
    df = reader.csv(path)
    for marker in (null_values or [])[1:]:
        for c, dt in [(f.name, f.dataType) for f in df.schema.fields]:
            if dt.typeName() == "string":
                df = df.withColumn(
                    c, F.when(F.col(c) == marker, None).otherwise(F.col(c))
                )
    return df


@dataclass
class FixedWidthField:
    name: str
    start: int  # 1-based, inclusive
    length: int
    type: str = "string"
    trim: bool = True


def read_fixed_width(
    spark: SparkSession, path: str, fields: list[FixedWidthField]
) -> DataFrame:
    """S5: fixed-width scan — byte-offset slicing as column expressions over
    ``spark.read.text`` (insee/deces/task_functions.py:71-90). No UDF: every
    field is a substring projection inside one codegen stage."""
    raw = spark.read.text(path)
    cols = []
    for f in fields:
        c = F.substring(F.col("value"), f.start, f.length)
        if f.trim:
            c = F.trim(c)
        cols.append(c.cast(f.type).alias(f.name))
    return raw.select(*cols)


def read_multi_section(
    spark: SparkSession, path: str, prefix_len: int
) -> DataFrame:
    """S6: multi-section file split — one physical file holding N
    concatenated CSVs, sections detected where the leading key prefix
    changes (sante/finess/task_functions.py:51-101).

    Returns (section_id, line_no, value). Needs a global line ordering: uses
    a single-partition window, correct for the reference's bounded files;
    huge inputs should carry an explicit line-number column instead.
    """
    from datagouvfr_data_pipelines_spark.operators.windows import section_ids

    raw = (
        spark.read.text(path)
        .withColumn("line_no", F.monotonically_increasing_id())
        .withColumn("prefix", F.substring("value", 1, prefix_len))
    )
    return section_ids(raw, "line_no", "prefix").select(
        "section_id", "line_no", "value"
    )


def read_json_records(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """S7: JSON records scan (API snapshot landed to storage). Explicit
    schema preferred; multiline for payload dumps."""
    reader = spark.read.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def flatten_json_column(df: DataFrame, col: str, schema: str) -> DataFrame:
    """S7/§2.8 JSON: parse a JSON string column into typed fields
    (consolidation.py:226-286 parse_api flattening)."""
    return df.withColumn(col, F.from_json(F.col(col), schema))


def read_binary_archives(spark: SparkSession, path_glob: str) -> DataFrame:
    """S10: archive scan stage 1 — binaryFile read of zip/7z/tar.gz objects;
    unpack happens in a mapInPandas stage downstream (rna/task_functions.py
    :49-84). Returns (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(path_glob)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same native columnar path as parquet (vectorized reader,
    predicate pushdown, column pruning); the engine treats ORC as a
    first-class interchange format for Hive-era lakes."""
    return spark.read.orc(path)


def read_parquet_resilient(
    spark: SparkSession,
    path: str,
    report: dict | None = None,
) -> DataFrame:
    """Parquet scan that survives corrupt/truncated files — at fleet scale
    a handful of bad objects (partial uploads, bit rot) must not kill a
    100 TB job.

    Scoped config: ``spark.sql.files.ignoreCorruptFiles`` applies per-read
    via the DataFrameReader option (not session-wide — silently skipping
    corrupt data everywhere would mask real bugs). When ``report`` is
    passed, the skipped files are IDENTIFIED by footer-probing the listing
    driver-side (cheap: 4 magic bytes at each end per file, metadata-only
    I/O) and recorded under ``report['corrupt_files']`` so the caller can
    alarm or quarantine — silent data loss is the failure mode to avoid,
    so the skip is always accounted for. Listing and probing go through
    the Hadoop FileSystem API, so the accounting works on ANY scheme the
    scan supports (s3a://, hdfs://, file:///…), not just the local
    filesystem.

    Known limit (documented, not silent): the probe catches truncation and
    header/footer corruption — the overwhelmingly dominant partial-upload
    failure mode — but NOT mid-file page corruption with intact magic
    bytes; for that, reconcile row counts against a manifest downstream.
    """
    df = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(path)
    )
    if report is not None:
        report["corrupt_files"] = _probe_corrupt_parquet(spark, path)
    return df


def _probe_corrupt_parquet(spark: SparkSession, path: str) -> list[str]:
    """List ``path`` recursively via the Hadoop FileSystem API and return
    the data files whose parquet magic bytes (``PAR1`` head + tail) are
    missing — scheme-agnostic (local, HDFS, object stores)."""
    jvm = spark._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    if not fs.exists(hpath):
        return []
    bad: list[str] = []
    it = fs.listFiles(hpath, True)  # recursive; files only
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith("_") or name.startswith("."):
            continue  # metadata / hidden markers, not scan inputs
        size = st.getLen()
        if size < 12:  # PAR1 + 4-byte footer len + PAR1 minimum
            bad.append(p.toString())
            continue
        stream = fs.open(p)
        try:
            # py4j copies byte[] args by value, so readFully(pos, buf)
            # can't hand bytes back — read the 8 magic bytes one at a
            # time (driver-side, 8 round-trips per file, metadata-scale).
            def _read4(pos: int) -> bytes:
                stream.seek(pos)
                out = bytearray()
                for _ in range(4):
                    b = stream.read()
                    if b < 0:
                        break
                    out.append(b)
                return bytes(out)

            if _read4(0) != b"PAR1" or _read4(size - 4) != b"PAR1":
                bad.append(p.toString())
        except Exception:
            bad.append(p.toString())
        finally:
            stream.close()
    return sorted(bad)
