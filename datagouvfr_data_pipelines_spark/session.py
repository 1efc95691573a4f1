"""SparkSession factory.

Design notes (100 TB target, tested on local[N]):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast decisions replace every hand-coded batching loop in the
  reference (see SURVEY §4 "do not port" rows, e.g.
  dvf/explore/task_functions.py:304-339 prefix batching).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location-independent.
- Arrow enabled for the pandas-UDF surface (geocode cascade, langid, ANN).
- shuffle.partitions defaults to 2x cores locally; on a real cluster this is
  overridden by AQE's coalescing from `spark.sql.adaptive.coalescePartitions`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def shuffle_partitions_for(
    input_bytes: int,
    target_bytes: int = 64 << 20,
    lo: int = 8,
    hi: int = 100_000,
) -> int:
    """Size shuffle partitions to the input volume (~64 MB per partition).

    At tiny inputs the default 32-way shuffle is pure scheduling overhead
    (AQE coalesces the DATA but the map stage still plans/launches the full
    fan-out); at 100 TB the same formula yields ~1.6M capped at ``hi`` —
    on a real cluster set ``hi`` to a few × total executor cores and let
    AQE's coalescing handle the rest. Callers with a known input dir pass
    the summed file size; the engine default stays ``DEFAULT_SHUFFLE_PARTITIONS``.
    """
    import math

    return max(lo, min(hi, math.ceil(max(input_bytes, 1) / target_bytes)))


SMALL_INPUT_BYTES = 1 << 30


def get_spark(
    app_name: str = "datagouvfr-spark-engine",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
    input_bytes: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with scale-ready defaults.

    ``input_bytes`` (when known) activates input-sized tuning: shuffle
    partitions follow ``shuffle_partitions_for``, and below
    ``SMALL_INPUT_BYTES`` adaptive execution is turned off — AQE's runtime
    re-planning (skew splits, dynamic coalescing/broadcast) pays off on
    large shuffles but its per-stage materialization latency dominates
    end-to-end time on sub-GB inputs. Above the threshold nothing is
    disabled; the 100 TB path always runs with AQE.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    adaptive = "true"
    if input_bytes is not None:
        shuffle_partitions = shuffle_partitions_for(input_bytes)
        if input_bytes < SMALL_INPUT_BYTES:
            adaptive = "false"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", adaptive)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Load the star-schema parquet tables under ``sf_dir`` and register temp views.

    Returns {name: DataFrame}. Parquet scans get column pruning + predicate
    pushdown from Catalyst for free; do not pre-materialize. Delegates to
    ``plans.catalog.table`` so the nanos-timestamp events table is
    normalized consistently.
    """
    from datagouvfr_data_pipelines_spark.plans.catalog import table

    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


_SHUFFLE_LOGICAL_NODES = None  # compiled lazily (re import kept out of module load)


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark byte-size conf ("128MB", "134217728b", "64m") to bytes."""
    import re

    try:
        raw = spark.conf.get(key)
    except Exception:
        return default
    if not raw:
        return default
    m = re.fullmatch(r"\s*(\d+)\s*([kmgtp]?i?b?)\s*", str(raw).lower())
    if not m:
        return default
    mult = {
        "": 1, "b": 1,
        "k": 1 << 10, "kb": 1 << 10, "kib": 1 << 10,
        "m": 1 << 20, "mb": 1 << 20, "mib": 1 << 20,
        "g": 1 << 30, "gb": 1 << 30, "gib": 1 << 30,
        "t": 1 << 40, "tb": 1 << 40, "tib": 1 << 40,
        "p": 1 << 50, "pb": 1 << 50, "pib": 1 << 50,
    }.get(m.group(2), 1)
    return int(m.group(1)) * mult


_STATS_UNKNOWN = 1 << 60  # Catalyst reports Long.MaxValue when size is unknown

# nodes that keep their child's partitioning (safe to look through when
# hunting for an explicit repartition count)
_WIDTH_PRESERVING = (
    "Project", "Filter", "Generate", "MapInPandas", "PythonMapInArrow",
    "MapElements", "DeserializeToObject", "SerializeFromObject", "Expand",
    "LocalLimit", "TypedFilter", "WithCTE", "CTERelationDef",
)


def _plan_width(df) -> int | None:
    """Estimate the frame's task width from the optimized logical plan.

    Never converts a shuffle-bearing frame to an RDD: under AQE that
    materializes its upstream shuffle query stages (running real jobs
    twice), and on static plans it reports the pre-coalesce partition
    count — so a frame AQE later collapses to one partition is wrongly
    judged "already wide". Decision ladder:

    1. an explicit ``repartition(N)``/``coalesce(N)`` at the top of the
       plan (looking through width-preserving nodes) pins the width to N
       — explicit-count repartitions are exempt from AQE coalescing;
    2. no shuffle-inducing node anywhere: the frame is scan/local-stage,
       so ``df.rdd.getNumPartitions()`` is exact AND safe (no exchanges
       exist, so nothing materializes and no job runs);
    3. shuffle-derived with known stats: width is what AQE's byte-based
       coalescing will leave, ``ceil(sizeInBytes / advisoryPartitionSize)``
       — pessimistic on purpose, because AQE coalesces on bytes while our
       callers' downstream cost is per-row compute;
    4. shuffle-derived with unknown stats: None (caller fans out).
    """
    global _SHUFFLE_LOGICAL_NODES
    if _SHUFFLE_LOGICAL_NODES is None:
        import re

        _SHUFFLE_LOGICAL_NODES = {
            "shuffle": re.compile(
                r"\b(Join|Aggregate|Window|Sort|Distinct|Deduplicate|Repartition"
                r"|RepartitionByExpression|RebalancePartitions|Except|Intersect"
                r"|CoGroup|FlatMapGroups|FlatMapCoGroups|MapGroups"
                r"|ApplyInPandasWithState|GlobalLimit)\b"
            ),
            "repart": re.compile(
                r"^(?:Repartition (\d+), (?:true|false)"
                r"|RepartitionByExpression \[.*\], (\d+)"
                r"|RebalancePartitions \[.*\], (\d+))$"
            ),
        }
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        tree = plan.treeString()
    except Exception:
        return None
    for raw in tree.splitlines():
        node = raw.lstrip(" :+-")
        m = _SHUFFLE_LOGICAL_NODES["repart"].match(node)
        if m:
            return int(next(g for g in m.groups() if g))
        if not node.startswith(_WIDTH_PRESERVING):
            break
    if not _SHUFFLE_LOGICAL_NODES["shuffle"].search(tree):
        try:
            return df.rdd.getNumPartitions()
        except Exception:
            return None
    try:
        size = int(plan.stats().sizeInBytes())
    except Exception:
        return None
    if size >= _STATS_UNKNOWN:
        return None
    per = _conf_bytes(
        df.sparkSession, "spark.sql.adaptive.advisoryPartitionSizeInBytes", 64 << 20
    )
    return 1 if size <= 0 else -(-size // per)


def fan_out(df, *key_cols):
    """Decouple compute parallelism from scan granularity.

    A parquet scan cannot split below row-group boundaries, so a
    single-file / few-row-group input feeds every core-hungry downstream
    projection (n-gram building, bigram explode, per-row folds) from a
    handful of tasks while the rest of the cluster idles. When the frame's
    estimated width (see ``_plan_width`` — derived from plan stats, never
    ``df.rdd``) is below the cluster's default parallelism, repartition up
    to it (hash on ``key_cols`` when the next shuffle key is known — the
    exchange then doubles as that stage's shuffle; round-robin otherwise).
    No-op whenever the input already fans wide: at 100 TB inputs carry
    thousands of row-groups and this adds nothing — the guard makes it
    safe to leave in scale paths permanently."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    width = _plan_width(df)
    if width is None:
        # Unknown width = shuffle-derived frame with unknown stats. A
        # post-shuffle frame already carries spark.sql.shuffle.partitions
        # tasks (>= defaultParallelism in our sessions), so it is not the
        # starved-scan case this helper exists for — and repartition(target)
        # here would COLLAPSE an already-wide frame to defaultParallelism
        # while adding a full shuffle. Keep the frame as-is, matching the
        # old getNumPartitions probe which no-op'd on these inputs.
        return df
    if width >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
