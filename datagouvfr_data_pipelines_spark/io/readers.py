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


def sniff_csv_dialect(
    path: str,
    sample_bytes: int = 65536,
    candidates: tuple[str, ...] = (",", ";", "\t", "|"),
) -> tuple[str, str]:
    """Driver-side encoding + separator detection for messy community CSV
    files, feeding :func:`read_csv_typed` — reference parity with the
    chardet + dialect cascade of schema/utils/consolidation.py:905-947.

    Encoding: deterministic cascade instead of chardet (not in this stack)
    — BOM sniff (UTF-8/UTF-16) -> strict UTF-8 decode -> cp1252 when
    Windows-only bytes 0x80-0x9F appear -> iso-8859-1. This covers the
    encodings the reference actually sees on data.gouv resources (UTF-8 /
    latin-1 / cp1252; the reference itself remaps chardet's Windows-1254
    guess to iso-8859-1, conceding the same "French community file"
    prior). Separator: ``csv.Sniffer`` over the decoded head restricted to
    ``candidates``, with a consistent-per-line-count fallback when the
    sniffer balks (single-column or heavily quoted heads).

    Head-sampling a file is inherently driver-side and local-path — the
    reference sniffs files it has already downloaded; sniff the landed
    copy before handing the path to the distributed scan. Gzip heads
    (magic 1f 8b) are transparently decompressed before sniffing, matching
    the reader's codec auto-detection.
    """
    import csv as _csv
    import gzip as _gzip

    with open(path, "rb") as fh:
        head = fh.read(sample_bytes)
    if head[:2] == b"\x1f\x8b":
        try:
            head = _gzip.decompress(head)  # whole-file read fits: small files
        except Exception:
            head = _gzip.GzipFile(fileobj=__import__("io").BytesIO(head)).read(
                sample_bytes
            )
    if head.startswith(b"\xef\xbb\xbf"):
        enc = "UTF-8"  # Spark's univocity parser skips the BOM itself
        head = head[3:]
    elif head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        enc = "UTF-16"
    else:
        try:
            head.decode("utf-8")
            enc = "UTF-8"
        except UnicodeDecodeError:
            enc = (
                "windows-1252"
                if any(0x80 <= b <= 0x9F for b in head)
                else "ISO-8859-1"
            )
    text = head.decode("utf-16" if enc == "UTF-16" else enc, errors="replace")
    lines = [ln for ln in text.splitlines() if ln.strip()][:20]
    if len(lines) > 2:
        lines = lines[:-1]  # last sampled line may be truncated mid-row
    sample = "\n".join(lines)
    try:
        sep = _csv.Sniffer().sniff(sample, delimiters="".join(candidates)).delimiter
    except _csv.Error:
        best, sep = 0, candidates[0]
        for c in candidates:
            counts = [ln.count(c) for ln in lines]
            if counts and min(counts) > 0 and len(set(counts)) == 1 and counts[0] > best:
                best, sep = counts[0], c
    return enc, sep


def read_csv_sniffed(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    **kwargs,
) -> DataFrame:
    """S1 with dialect detection: sniff encoding + separator from the file
    head (:func:`sniff_csv_dialect`), then run the typed scan. The
    consolidation engine's per-resource ingest path — community files
    declare no dialect, so the reference sniffs every one
    (schema/utils/consolidation.py:923-935)."""
    encoding, sep = sniff_csv_dialect(path)
    return read_csv_typed(
        spark, path, schema, sep=sep, encoding=encoding, **kwargs
    )


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
    a single-partition window — right for the reference's bounded files
    (FINESS ships a few hundred thousand lines). For inputs that do not fit
    one task, :func:`read_multi_section_distributed` computes identical
    section ids with a partitioned plan.
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


def read_multi_section_distributed(
    spark: SparkSession,
    path: str,
    prefix_len: int,
    n_buckets: int = 64,
    min_partitions: int | None = None,
) -> DataFrame:
    """S6 at scale: same contract as :func:`read_multi_section` — contiguous
    ``line_no``, identical ``section_id`` assignment — but no global-sort
    window anywhere in the plan.

    Line numbering uses ``textFile().zipWithIndex()`` (one of the few
    legitimate RDD uses: contiguous order-preserving ids need the extra
    per-partition count pass zipWithIndex does); sectioning is
    :func:`distributed_section_ids` — bucket-local lag + an
    ``n_buckets``-row driver boundary fix, one shuffle total.
    """
    from datagouvfr_data_pipelines_spark.operators.windows import (
        distributed_section_ids,
    )

    rdd = (
        spark.sparkContext.textFile(path, min_partitions)
        if min_partitions
        else spark.sparkContext.textFile(path)
    ).zipWithIndex()
    raw = spark.createDataFrame(rdd, "value string, line_no long").withColumn(
        "prefix", F.substring("value", 1, prefix_len)
    )
    return distributed_section_ids(
        raw, "line_no", "prefix", n_buckets=n_buckets
    ).select("section_id", "line_no", "value")


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
