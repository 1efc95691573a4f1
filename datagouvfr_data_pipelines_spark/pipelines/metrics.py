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
    "reuses": r"/reuses/([\w-]+)/?",
    "dataservices": r"/dataservices/([\w-]+)/?",
}

# ---------------------------------------------------------------------------
# Faithful HAProxy-log port — all five object types, golden-file checked
# against the reference's dgv/metrics/test fixtures (byte-level).
# Reference: config.yaml + config.py DataGouvLog pattern compilation +
# task_functions.py extract_log_info/aggregate_metrics.
# ---------------------------------------------------------------------------

# service-certificate gate + success statuses + GET (config.yaml:19-21)
GLOBAL_PATTERN = r' DATAGOUVFR_RGS~ .* (?:200|302) .* "GET .*'
API_SEGMENTS = ["/api/1", "/api/2"]
WEB_SEGMENTS = ["/fr", "/en", "/es", ""]
DATABASE_EXCLUDED_COLUMNS = ["url", "slug", "archived", "created_at"]

# yaml order matters twice: type priority (first matching type wins) and
# pattern priority within a type (config.py:40-59 builds an ordered dict:
# additional_patterns first, then a default per-segment pattern for every
# segment not already covered)
DATAGOUV_LOG_TYPES: dict[str, dict] = {
    "resources": {
        "catalog_columns": {
            "url": "url",
            "id": "resource_id",
            "dataset.id": "dataset_id",
            "dataset.organization_id": "organization_id",
            "dataset.archived": "archived",
            "created_at": "created_at",
        },
        "static_segments": ["static_resource"],
        "additional_patterns": {
            "api_permalink": r"/api/1/datasets/r/([^/?\s]*)",
            "api1": r"/api/1/datasets/.*/resources/([^/?\s]*)",
            "api2": r"/api/2/datasets/resources/([^/?\s]*)",
            "static_resource": r"(?:https://static\.data\.gouv\.fr)?/resources/([^?\s]*)",
            "fr": r"/fr/datasets/r/([^/?\s]*)",
            "en": r"/en/datasets/r/([^/?\s]*)",
            "es": r"/es/datasets/r/([^/?\s]*)",
        },
    },
    "datasets": {
        "catalog_columns": {
            "slug": "slug",
            "id": "dataset_id",
            "organization_id": "organization_id",
        },
    },
    "organizations": {
        "catalog_columns": {"slug": "slug", "id": "organization_id"},
    },
    "reuses": {
        "catalog_columns": {
            "slug": "slug",
            "id": "reuse_id",
            "organization_id": "organization_id",
        },
    },
    "dataservices": {
        "catalog_columns": {
            "slug": "slug",
            "id": "dataservice_id",
            "organization_id": "organization_id",
        },
    },
}

ALL_STATIC_SEGMENTS = [
    s for spec in DATAGOUV_LOG_TYPES.values() for s in spec.get("static_segments", [])
]


def build_log_patterns(object_type: str) -> dict[str, str]:
    """Ordered segment -> full regex for one object type, composed exactly
    like the reference's DataGouvLog (config.py:40-59): additional patterns
    first (yaml order), then ``<segment>/<type>/([^/?\\s]*)`` for every
    remaining segment of api+web, all prefixed with the global gate."""
    spec = DATAGOUV_LOG_TYPES[object_type]
    patterns = {
        seg: GLOBAL_PATTERN + pat
        for seg, pat in spec.get("additional_patterns", {}).items()
    }
    for segment in API_SEGMENTS + WEB_SEGMENTS:
        key = segment.replace("/", "")
        if key not in patterns:
            patterns[key] = (
                rf"{GLOBAL_PATTERN}{segment}/{object_type}/([^/?\s]*)"
            )
    return patterns


def weblog_pattern_table() -> list[tuple[str, str, str]]:
    """Flattened (type, segment, pattern) rows in exact first-match-wins
    priority order — the double loop of extract_log_info
    (task_functions.py:91-122) as data."""
    return [
        (obj_type, segment, pattern)
        for obj_type in DATAGOUV_LOG_TYPES
        for segment, pattern in build_log_patterns(obj_type).items()
    ]


def extract_hits_typed(raw: DataFrame, date: str) -> DataFrame:
    """All five object types in ONE scan: a priority-ordered CASE chain of
    ``regexp_extract`` calls (JVM regex, whole-stage codegen — the
    reference runs the same double regex loop per line in Python,
    task_functions.py:91-122). An empty capture group falls through to the
    next pattern, exactly like the reference's ``if object_slug:`` guard.

    Input: a ``value`` column of raw log lines (any other columns — e.g. a
    line number for golden exports — pass through). Output: (object_type,
    id, date_metric, segment) per matched line. Ordering is not promised —
    the aggregate is order-free; golden exports that need log order carry
    a line number (see tests/test_metrics_golden.py).

    Codegen shape: the extraction is staged as TWO projections — first the
    32 ``regexp_extract`` slug columns, then the priority CASE over those
    cheap string columns. The naive fused form (each branch re-evaluating
    its regex in condition and value, and the trailing ``h IS NOT NULL``
    predicate-pushed through both projects into the scan) compiles to a
    >64KB Java method; janino rejects it and Spark silently drops the
    whole stage to interpreted row evaluation — fatal for the hottest
    100 TB scan. Three measures keep every generated method small:
    (1) a single cheap ``rlike`` gate on the shared global pattern is the
    only predicate that reaches the scan (it rejects non-RGS/POST/error
    lines before any of the 32 regexes run); (2) the ``h`` projection is
    wrapped in a nondeterministic always-true guard
    (``spark_partition_id() >= 0``) — a nondeterministic project field
    cannot be predicate-pushed through or collapse-inlined, so the match
    filter's ``isnotnull(h)`` stays a filter over the ``h`` attribute.
    Without the guard, Catalyst rewrites ``isnotnull(CASE ...)`` into a
    disjunction of the 32 match conditions and pushes it through every
    projection down to the scan, substituting each regex AND the
    caller's ``value`` definition per disjunct (observed on
    m5_weblog_hits, whose value is a synthesized concat/CASE line: a
    1.5 MB source method); (3) the match CASE itself runs over plain
    attribute references. Pinned by
    tests/test_metrics_golden.py::test_extract_stage_compiles with
    ``spark.sql.codegen.fallback=false``.
    """
    table_rows = weblog_pattern_table()
    slug_cols = {
        f"__s{i}": F.regexp_extract("value", pattern, 1)
        for i, (_, _, pattern) in enumerate(table_rows)
    }
    staged = raw.where(F.col("value").rlike(GLOBAL_PATTERN)).withColumns(
        slug_cols
    )
    hit = None
    for i, (obj_type, segment, _) in enumerate(table_rows):
        slug = F.col(f"__s{i}")
        value = F.struct(
            F.lit(obj_type).alias("object_type"),
            slug.alias("id"),
            F.lit(segment).alias("segment"),
        )
        hit = F.when(slug != "", value) if hit is None else hit.when(
            slug != "", value
        )
    passthrough = [c for c in raw.columns if c != "value"]
    return (
        staged.withColumn("h", F.when(F.spark_partition_id() >= 0, hit))
        .where(F.col("h").isNotNull())
        .select(
            "h.object_type",
            "h.id",
            F.lit(date).alias("date_metric"),
            "h.segment",
            *passthrough,
        )
    )


def _rename_catalog(catalog: DataFrame, object_type: str) -> DataFrame:
    """Apply catalog_columns orig -> renamed up front (the reference renames
    at the end; the mapping is a bijection so the order is immaterial, and
    renamed names avoid Spark's dotted-identifier parsing on columns like
    ``dataset.archived``)."""
    for orig, new in DATAGOUV_LOG_TYPES[object_type]["catalog_columns"].items():
        if orig != new:
            catalog = catalog.withColumnRenamed(orig, new)
    return catalog


def catalog_id_mapping(catalog: DataFrame, object_type: str) -> DataFrame:
    """(lookup_key, id) mapping frame — the broadcast-join form of the
    reference's driver dicts. ``catalog`` must already carry RENAMED
    columns (see _rename_catalog).

    Non-resources (get_catalog_id_mapping, task_functions.py:13-26): both
    the slug and the id map to the id; dict writes interleave per row
    (slug write then id write), later writes win duplicate keys.

    Resources (aggregate_metrics, task_functions.py:186-217): dedup by id
    (archived asc, created_at desc — strings, like the reference's
    dtype="string" frame), then rows with a static.data.gouv.fr url map
    their static SLUG to the id, rows without map id -> id (two separate
    bulk dict updates: every id write lands after every slug write). A
    static-url resource hit by raw id is deliberately unmapped, as in the
    reference.
    """
    id_col = DATAGOUV_LOG_TYPES[object_type]["catalog_columns"]["id"]
    cat = catalog.withColumn("__pos", F.monotonically_increasing_id())
    if object_type == "resources":
        static_uri = "https://static.data.gouv.fr/resources/"
        deduped = keep_best_row(
            cat,
            [id_col],
            [
                F.col("archived").asc(),
                F.col("created_at").desc(),
                F.col("__pos").asc(),
            ],
        )
        is_static = F.col("url").contains(static_uri)
        slugs = deduped.where(is_static).select(
            F.replace(F.col("url"), F.lit(static_uri), F.lit("")).alias("__key"),
            F.col(id_col).alias("__mapped_id"),
            # two bulk updates: ids (prio 1) always overwrite slugs (prio 0)
            F.lit(0).alias("__prio"),
            "__pos",
        )
        ids = deduped.where(~is_static).select(
            F.col(id_col).alias("__key"),
            F.col(id_col).alias("__mapped_id"),
            F.lit(1).alias("__prio"),
            "__pos",
        )
        order = [F.col("__prio").desc(), F.col("__pos").desc()]
    else:
        slugs = cat.select(
            F.col("slug").alias("__key"),
            F.col(id_col).alias("__mapped_id"),
            # per-row interleaving: write sequence = 2*row + offset
            (F.col("__pos") * 2).alias("__prio"),
            "__pos",
        )
        ids = cat.select(
            F.col(id_col).alias("__key"),
            F.col(id_col).alias("__mapped_id"),
            (F.col("__pos") * 2 + 1).alias("__prio"),
            "__pos",
        )
        order = [F.col("__prio").desc()]
    pairs = slugs.unionByName(ids)
    # dict semantics: the LAST write wins
    return keep_best_row(pairs, ["__key"], order).select("__key", "__mapped_id")


def aggregate_object_metrics(
    found: DataFrame, catalog: DataFrame, object_type: str
) -> DataFrame:
    """The aggregate_metrics stage (task_functions.py:186-269) for one
    object type: map slugs to ids through the catalog (unmapped hits drop,
    like pandas groupby on a NaN key), one conditional-count pass per
    (date, id), broadcast-join the catalog attributes, emit the reference's
    exact output column order sorted by (date_metric, id).

    ``found`` schema: id, date_metric, segment (segment may be null).
    ``catalog`` carries the reference's ORIGINAL column names (e.g.
    ``dataset.id``); they are renamed internally via catalog_columns."""
    spec = DATAGOUV_LOG_TYPES[object_type]
    id_col = spec["catalog_columns"]["id"]
    cat = _rename_catalog(catalog, object_type)
    mapping = catalog_id_mapping(cat, object_type)
    hits = (
        found.withColumnRenamed("id", "__key")
        .join(F.broadcast(mapping), "__key", "inner")
        .select(
            "date_metric",
            F.col("__mapped_id").alias(id_col),
            F.coalesce(F.col("segment"), F.lit("")).alias("segment"),
        )
    )

    seg = F.col("segment")
    web_keys = [s.replace("/", "") for s in WEB_SEGMENTS]
    api_keys = [s.replace("/", "") for s in API_SEGMENTS]
    conditions = {
        "nb_visit_static": seg.isin(ALL_STATIC_SEGMENTS),
        "nb_visit_api_permalink": seg.isin(["api_permalink"]),
        "nb_visit": seg.isin(web_keys + ALL_STATIC_SEGMENTS + ["api_permalink"]),
        "nb_visit_apis": seg.isin(api_keys),
    }
    for key in api_keys + web_keys:
        conditions[f"nb_visit_{key}"] = seg == key
    agg = conditional_count_agg(
        hits, ["date_metric", id_col], conditions, total_alias="nb_visit_total"
    )

    catalog_out = cat
    if object_type == "resources":
        catalog_out = keep_best_row(
            cat.withColumn("__pos", F.monotonically_increasing_id()),
            [id_col],
            [
                F.col("archived").asc(),
                F.col("created_at").desc(),
                F.col("__pos").asc(),
            ],
        ).drop("__pos")
    enriched = broadcast_enrich(agg, catalog_out, [id_col], "left")

    out_cols = (
        ["date_metric"]
        + [
            c
            for c in spec["catalog_columns"].values()
            if c not in DATABASE_EXCLUDED_COLUMNS
        ]
        + ["nb_visit", "nb_visit_apis", "nb_visit_total"]
        + [f"nb_visit_{k}" for k in api_keys + web_keys]
        + ["nb_visit_static"]
    )
    if object_type == "resources":
        out_cols += ["nb_visit_api_permalink"]
    return enriched.select(*out_cols).orderBy("date_metric", id_col)


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
