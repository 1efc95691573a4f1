"""Window operators (SURVEY §2.5) — the reference's "windows in disguise".

All are single-shuffle window computations; partitioning by the session /
dedup key means they scale horizontally (each key's rows are processed on one
executor — keys are assumed small relative to partitions; skewed keys fall to
AQE).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def session_ids(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    gap_seconds: int,
    session_alias: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W1: sessionization — new session when the gap to the previous event
    exceeds ``gap_seconds`` within a partition key.

    Ref: mutation-id assignment via sorted change-detection cumsum
    (dvf/geoloc/task_functions.py:257-268) — same lag/cumsum shape. Gap math
    runs on integer microseconds (``unix_micros``) so results are exact and
    reproducible; ``tiebreak_cols`` make the ordering total when timestamps
    can collide.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w_order = Window.partitionBy(partition_col).orderBy(*order)
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # unix_micros only accepts TIMESTAMP; the NTZ->TZ cast interprets
        # wall time in the session tz, and gap DIFFERENCES are offset-free.
        ts = ts.cast("timestamp")
    us = F.unix_micros(ts)
    gap = us - F.lag(us).over(w_order)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_alias, F.sum(is_new).over(w_cum))


def change_detection_ids(
    df: DataFrame,
    order_cols: list[Column],
    change_cols: list[str],
    alias: str = "group_id",
) -> DataFrame:
    """W1 variant: new id whenever any of ``change_cols`` changes after sort.

    Global ordering implies a single-partition window — correct for the
    reference's per-file scope; for 100 TB add a partition key.
    """
    w = Window.orderBy(*order_cols)
    changed = F.lit(False)
    for c in change_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    is_new = F.when(F.row_number().over(w) == 1, 1).otherwise(
        F.when(changed, 1).otherwise(0)
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias, F.sum(is_new).over(w_cum))


def keep_best_row(
    df: DataFrame, partition_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """W2/O5: deterministic keyed dedup — keep the first row per key under an
    explicit ordering.

    This is the ONLY sanctioned keyed-dedup form in the engine:
    ``dropDuplicates`` after ``orderBy`` is nondeterministic in Spark
    (SURVEY §4 custom-rule #4). Ref: resource catalog dedup
    (dgv/metrics/task_functions.py:198-201), consolidation primaryKey dedup
    (schema/utils/consolidation.py:1028-1041).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def section_ids(
    df: DataFrame, order_col: str, prefix_col: str, alias: str = "section_id"
) -> DataFrame:
    """W4: multi-section file split — section increments when ``prefix_col``
    changes across consecutive lines (sante/finess/task_functions.py:62-83).
    """
    w = Window.orderBy(F.col(order_col).asc())
    changed = ~F.col(prefix_col).eqNullSafe(F.lag(F.col(prefix_col)).over(w))
    is_new = F.when(F.row_number().over(w) == 1, 1).otherwise(
        F.when(changed, 1).otherwise(0)
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias, F.sum(is_new).over(w_cum))


def distributed_section_ids(
    df: DataFrame,
    order_col: str,
    prefix_col: str,
    alias: str = "section_id",
    n_buckets: int = 64,
) -> DataFrame:
    """W4 at scale: section ids WITHOUT the single-partition window.

    Same fixed-width range-bucketing as :func:`global_prefix_sum`: rows
    bucket by arithmetic on the (unique, numeric, order-contiguous)
    ``order_col``; a bucket-LOCAL lag marks in-bucket prefix changes; the
    per-bucket edge summary (first prefix, last prefix, local break count —
    ``n_buckets`` rows) collects to the driver, which decides for each
    bucket whether its first row starts a new section (its prefix differs
    from the previous bucket's last prefix) and folds the exclusive break
    offsets; a broadcast literal map turns those into per-bucket bases.
    ``section_id = base[bucket] + running local breaks`` — equal to the
    global-window form for ANY bucket count, with one shuffle (reused by
    both window frames) and a K-row driver pass instead of a global sort.

    NULL prefixes compare like ``eqNullSafe`` (NULL == NULL continues a
    section), matching :func:`section_ids`.
    """
    bounds = df.agg(
        F.min(order_col).alias("mn"),
        F.max(order_col).alias("mx"),
        F.sum(F.col(order_col).isNull().cast("long")).alias("n_null"),
    ).first()
    if (bounds.n_null or 0) > 0:
        raise ValueError(
            f"distributed_section_ids: order_col {order_col!r} has NULL rows"
        )
    if bounds.mn is None:
        return df.withColumn(alias, F.lit(None).cast("long"))
    mn, mx = int(bounds.mn), int(bounds.mx)
    width = max((mx - mn + n_buckets) // n_buckets, 1)
    d = df.withColumn(
        "__b", ((F.col(order_col) - F.lit(mn)) / width).cast("long")
    )
    w = Window.partitionBy("__b").orderBy(F.col(order_col).asc())
    prev = F.lag(F.col(prefix_col)).over(w)
    d = d.withColumn(
        "__new",
        F.when(prev.isNull(), F.lit(0)).otherwise(
            (~F.col(prefix_col).eqNullSafe(prev)).cast("int")
        ),
    )
    edges = sorted(
        d.groupBy("__b")
        .agg(
            F.min_by(prefix_col, F.col(order_col)).alias("first_p"),
            F.max_by(prefix_col, F.col(order_col)).alias("last_p"),
            F.sum("__new").alias("n_local"),
        )
        .collect(),
        key=lambda r: r["__b"],
    )
    base, acc, prev_last = {}, 0, object()  # sentinel: first bucket breaks
    for r in edges:
        fb = 1 if r["first_p"] != prev_last else 0
        base[r["__b"]] = acc + fb
        acc += fb + int(r["n_local"] or 0)
        prev_last = r["last_p"]
    base_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(base.items()) for x in kv]),
        F.col("__b"),
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        d.withColumn(alias, base_expr + F.sum("__new").over(w_cum))
        .drop("__b", "__new")
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: for each user, how far the event sequence
    ``steps[0] -> steps[1] -> ...`` progresses, where step k must occur
    STRICTLY AFTER the completion of step k-1.

    Earliest-completion greedy: each step's anchor is the minimum
    qualifying timestamp; by the standard exchange argument this finds an
    ordered subsequence whenever one exists, so ``stage`` is exact. One
    filtered partial-agg + one key join per step (len(steps) is small);
    users who never perform the first step are absent (stage 0).

    Returns (user, t_1..t_k timestamps — NULL once the funnel breaks,
    stage = number of completed steps).
    """
    result = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        cand = df.where(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        nxt = (
            cand.join(
                result.select(user_col, f"t_{i - 1}"), on=user_col
            )
            .where(F.col("__ts") > F.col(f"t_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t_{i}"))
        )
        result = result.join(nxt, on=user_col, how="left")
    stage = sum(
        F.col(f"t_{i}").isNotNull().cast("int")
        for i in range(1, len(steps) + 1)
    )
    return result.withColumn("stage", stage)


def global_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    alias: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1..N row numbering WITHOUT the single-partition window.

    ``row_number() OVER (ORDER BY ...)`` funnels every row through ONE task
    — the classic scale-killer (fine at 60k rows, dead at 100 TB). This is
    the distributed form: range-shuffle on the order key, count rows per
    range partition (a K-row aggregate), turn the counts into per-partition
    offsets (window over the K-row frame — the only single-partition step,
    sized by partition COUNT not data), broadcast the offsets back and
    number rows partition-locally. Two data shuffles total (range + the
    pid-window hash), each fully parallel.

    ``order_cols`` must be a total order (include a unique tiebreaker) or
    ids are partitioning-dependent.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_pid.groupBy("__pid")
        .count()
        .select(
            "__pid",
            F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    w_local = Window.partitionBy("__pid").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(alias, F.col("__off") + F.row_number().over(w_local))
        .drop("__pid", "__off")
    )


def global_prefix_sum(
    df: DataFrame,
    order_key: str,
    order_cols: list,
    value_col: str,
    alias: str = "cum_sum",
    n_buckets: int = 64,
    descending: bool = False,
    total_alias: str | None = None,
) -> DataFrame:
    """Inclusive running total of ``value_col`` over a GLOBAL order without
    the single-partition window (``Window.orderBy`` with no partition key
    funnels the whole table through one task — the classic 100 TB killer).

    The ``pack_sequences`` recipe, generalized: rows are fixed-width
    range-bucketed on numeric ``order_key`` (deterministic arithmetic — no
    ``repartitionByRange`` sampling, whose boundaries can shift between
    the two jobs that read them); each bucket runs a bucket-local
    inclusive cumsum (bounded window WITH a partition key); the
    ``n_buckets`` bucket totals collect to the driver, fold into exclusive
    prefix offsets, and broadcast back as a literal map. Rows that tie on
    ``order_key`` land in the same bucket, so any tiebreak columns in
    ``order_cols`` stay bucket-local and the result equals the
    single-window form for ANY bucket count.

    Exact only for integer/decimal ``value_col`` (associative addition) —
    quantize floats to integer units first or the regrouped partial sums
    won't be bit-stable. Skewed ``order_key`` distributions unbalance
    buckets but never break correctness; raise ``n_buckets`` to re-spread.

    ``order_cols`` are Column expressions (may carry .desc()) and must be a
    total order consistent with ``order_key``/``descending``.

    ``total_alias`` attaches the grand total as a literal column for free
    (it is the driver fold's final accumulator) — use it instead of a
    separate ``SUM() OVER ()`` / 1-row crossJoin when the share-of-total
    is needed alongside the running total.

    ``order_key`` must be non-NULL on every row: NULL has no place in a
    total order, so the function FAILS FAST with a ValueError rather than
    bucketing NULL rows arbitrarily (they would otherwise surface as a
    ``None`` bucket and crash the driver fold with an unorderable-types
    TypeError — round-4 advice). Filter or impute NULL keys first.
    """
    bounds = df.agg(
        F.min(order_key).alias("mn"),
        F.max(order_key).alias("mx"),
        F.sum(F.col(order_key).isNull().cast("long")).alias("n_null"),
    ).first()
    if (bounds.n_null or 0) > 0:
        raise ValueError(
            f"global_prefix_sum: order_key {order_key!r} has "
            f"{bounds.n_null} NULL row(s); a running total needs a total "
            "order — filter or impute NULL keys before calling"
        )
    if bounds.mn is None:
        out = df.withColumn(alias, F.lit(None).cast("long"))
        if total_alias:
            out = out.withColumn(total_alias, F.lit(None).cast("long"))
        return out
    mn, mx = int(bounds.mn), int(bounds.mx)
    width = max((mx - mn + n_buckets) // n_buckets, 1)
    if descending:
        bucket = ((F.lit(mx) - F.col(order_key)) / width).cast("long")
    else:
        bucket = ((F.col(order_key) - F.lit(mn)) / width).cast("long")

    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = df.withColumn("__bucket", bucket).withColumn(
        "__local_cum", F.sum(value_col).over(w_local)
    )
    totals = {
        r["__bucket"]: r["t"]
        for r in local.groupBy("__bucket")
        .agg(F.sum(value_col).cast("long").alias("t"))
        .collect()
    }
    prefix, acc = {}, 0
    for b in sorted(totals):
        prefix[b] = acc
        acc += totals[b]
    prefix_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(prefix.items()) for x in kv]),
        F.col("__bucket"),
    )
    out = local.withColumn(alias, prefix_expr + F.col("__local_cum")).drop(
        "__bucket", "__local_cum"
    )
    if total_alias:
        out = out.withColumn(total_alias, F.lit(acc).cast("long"))
    return out


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Pareto front (minimize ``x_col``, maximize ``y_col``), distributed.

    A point is dominated when another distinct point is <= in x AND >= in
    y with at least one strict. Canonical two-phase skyline: a
    partition-LOCAL dominance pass first (sort (x asc, y desc) within each
    partition; after projecting to distinct points, a row is dominated iff
    the running y-max of its predecessors >= its y), then the same pass
    globally over the local survivors — which are at most O(front) per
    partition, so the final single-partition sort sees front-sized data,
    not the table. Local passes can only UNDER-prune (keep dominated
    points for the global pass to drop), never over-prune: a dominator in
    another partition survives its own local pass.
    """

    def _pass(frame: DataFrame, part_cols: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            if part_cols
            else Window.partitionBy()
        )
        w = w.orderBy(F.col(x_col).asc(), F.col(y_col).desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return (
            frame.withColumn("__prev_max", F.max(y_col).over(w))
            .where(
                F.col("__prev_max").isNull()
                | (F.col("__prev_max") < F.col(y_col))
            )
            .drop("__prev_max")
        )

    pts = df.select(x_col, y_col).distinct()
    local = _pass(
        pts.withColumn("__pid", F.spark_partition_id()), ["__pid"]
    ).drop("__pid")
    return _pass(local, [])
