"""Web-log metrics pipeline (SURVEY §3.1, dgv_metrics).

Reference lifecycle: stream HAProxy tar.gz in 300 MB batches, regex-match
each line, buffer 20k hits to CSV, dict-map slug->id, conditional-count
aggregate per (date, object), join catalog, delete-then-insert by date
(dgv/metrics/task.py:128-283; task_functions.py:61-269).

Spark shape — ONE job, no buffers, no batch loops:
    read.text -> regexp_extract -> conditional-count agg -> broadcast
    catalog join -> idempotent date-partition overwrite.
The 300 MB batching and 20k flush become partitioned scan + shuffle; the
delete+COPY idempotence becomes dynamic partition overwrite (ST2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datagouvfr_data_pipelines_spark.operators.aggregates import conditional_count_agg
from datagouvfr_data_pipelines_spark.operators.joins import broadcast_enrich
from datagouvfr_data_pipelines_spark.operators.windows import keep_best_row

# HAProxy-ish access line: <ts> <ip> "<METHOD> <url>" <status> <segment>
LOG_PATTERN = r'^(\S+) (\S+) "(\w+) ([^"]+)" (\d{3}) (\S+)$'

# per-object-type URL patterns (the reference compiles these from
# dgv/metrics/config.yaml:25-43)
OBJECT_PATTERNS = {
    "datasets": r"/datasets/([\w-]+)/?",
    "resources": r"/resources/([0-9a-f-]{36})",
    "organizations": r"/organizations/([\w-]+)/?",
}


def parse_logs(raw: DataFrame, object_type: str) -> DataFrame:
    """Extract (date, slug, segment) hits for one object type from raw log
    lines — the parse_logs stage (task_functions.py:61-86) as pure regexp
    projections; non-matching lines drop out via the empty-extract filter."""
    pattern = OBJECT_PATTERNS[object_type]
    parsed = raw.select(
        F.regexp_extract("value", LOG_PATTERN, 1).alias("ts_raw"),
        F.regexp_extract("value", LOG_PATTERN, 4).alias("url"),
        F.regexp_extract("value", LOG_PATTERN, 5).alias("status"),
        F.regexp_extract("value", LOG_PATTERN, 6).alias("segment"),
    ).where(F.col("url") != "")
    hits = parsed.select(
        F.to_date(F.to_timestamp("ts_raw")).alias("date_metric"),
        F.regexp_extract("url", pattern, 1).alias("slug"),
        "segment",
        F.col("status").cast("int").alias("status"),
    ).where((F.col("slug") != "") & (F.col("status") < 400))
    return hits


def aggregate_visits(hits: DataFrame, segments_web: list[str], segments_api: list[str]) -> DataFrame:
    """A4 conditional-count aggregate per (date, slug) — one pass
    (task_functions.py:226-262)."""
    return conditional_count_agg(
        hits,
        ["date_metric", "slug"],
        {
            "nb_visit": F.col("segment").isin(segments_web),
            "nb_visit_api": F.col("segment").isin(segments_api),
        },
        total_alias="nb_hit",
    )


def dedupe_catalog(catalog: DataFrame, id_col: str = "slug") -> DataFrame:
    """W2 catalog dedup: archived asc, created_at desc, keep first
    (task_functions.py:198-201) — window form, never dropDuplicates."""
    return keep_best_row(
        catalog, [id_col], [F.col("archived").asc(), F.col("created_at").desc()]
    )


def run_metrics_job(
    spark: SparkSession,
    log_path: str,
    catalog: DataFrame,
    sink_path: str,
    object_type: str = "datasets",
    segments_web: list[str] | None = None,
    segments_api: list[str] | None = None,
) -> DataFrame:
    """Full §3.1 job; returns the frame it wrote (for assertions)."""
    from datagouvfr_data_pipelines_spark.io.writers import overwrite_date_partition

    raw = spark.read.text(log_path)
    hits = parse_logs(raw, object_type)
    agg = aggregate_visits(
        hits, segments_web or ["fr", "en"], segments_api or ["api", "api2"]
    )
    cat = dedupe_catalog(catalog)
    enriched = broadcast_enrich(agg, cat.select("slug", "object_id"), ["slug"], "left")
    out = enriched.withColumn("date_metric", F.col("date_metric").cast("string"))
    overwrite_date_partition(out, sink_path, "date_metric")
    return out
