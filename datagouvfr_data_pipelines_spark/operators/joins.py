"""Join operators (SURVEY §2.3).

Scale posture: dimension tables (region/nation/part/supplier — and in the
reference epci, deps_regs, nature maps, dvf/explore/task_functions.py:426-431)
are broadcast explicitly; fact-fact joins shuffle on their keys and rely on
AQE for skew splitting. The reference's manual prefix-batched joins
(dvf/geoloc/task_functions.py:111-154) are deliberately NOT ported — a plain
shuffled equi-join with parquet min/max pruning subsumes them (SURVEY §2.3
J-note).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def broadcast_enrich(fact: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """J1/J12: left-enrich a fact table with a small dimension, broadcast side.

    Ref: sales <- EPCI on code_commune (dvf/explore/task_functions.py:469-471).
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """J7: rows of ``left`` with no match in ``right``.

    Ref: deaths minus opposition list (insee/deces/task_functions.py:179-187).
    """
    return left.join(right, on=on, how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """J8: rows of ``left`` having a match in ``right`` (no duplication).

    Ref: keep sales whose id is in the mono-sale list
    (dvf/explore/task_functions.py:507-511).
    """
    return left.join(right, on=on, how="left_semi")


def full_outer_coalesce(
    left: DataFrame, right: DataFrame, keys: list[str], coalesced_prefix: str = ""
) -> DataFrame:
    """J4: FULL OUTER JOIN on ``keys`` with coalesced key columns.

    Ref: visits ⟗ matomo on (id, date) with COALESCE(a.id, b.id)
    (dgv/metrics/sql/create_tables.sql:127-145). Using the list-form ``on``
    makes Spark emit a single coalesced key column natively.
    """
    return left.join(right, on=keys, how="full")


def join_aggregated(
    fact: DataFrame,
    detail: DataFrame,
    keys: list[str],
    aggs,
    how: str = "left",
) -> DataFrame:
    """J5: left join against a grouped subquery (create_tables.sql:139-144).

    The aggregation happens BEFORE the join, so the join input is already
    reduced — at 100 TB this is the difference between shuffling the detail
    table once (small post-agg) vs joining then aggregating.
    """
    sub = detail.groupBy(*keys).agg(*aggs)
    return fact.join(sub, on=keys, how=how)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the skewed side, replicate the other.

    For hot keys (a handful of values carrying most rows — the reference's
    meteo prefix-batch growing loop is exactly this problem,
    meteo/pg_processing/task_functions.py:538-556), AQE's skew splitting
    handles sort-merge joins; this helper is the explicit form for cases AQE
    can't split (e.g. skewed aggregate-then-join pipelines): the skewed side
    gets a deterministic salt from its row content hash, the other side is
    replicated across all ``salt_buckets``, and the join key becomes
    (key, salt) — spreading each hot key over ``salt_buckets`` tasks.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    left = skewed.withColumn("__salt", salt.cast("int"))
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    right = other.withColumn("__salt", F.explode(buckets))
    out = left.join(right, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    partition_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreaker: str | None = None,
) -> DataFrame:
    """J14: as-of join — for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``partition_key``.

    Ref: mutation date -> latest parcel snapshot <= date
    (dvf/geoloc/task_functions.py:271-303), which the reference implements as
    a retry loop over snapshot batches.

    Spark-first implementation: union left probes and right states into one
    stream, sort within each key partition by (ts, is_right_first), and carry
    the right values forward with ``last(ignorenulls=True)`` over an
    unbounded-preceding window. One shuffle on the key; no loop, no
    per-snapshot retry. Scales as a single window over the co-partitioned
    union — the standard large-scale as-of strategy.

    Determinism: when the right side can hold duplicate (partition_key,
    right_ts) rows with differing payloads, pass ``right_tiebreaker`` (a
    right column ordering those duplicates) — it joins the window ORDER BY
    so ``last(ignorenulls)`` picks a total-order-defined winner. Without
    it, duplicate (key, ts) right rows make the carried value
    partitioning-dependent.
    """
    lcols = left.columns
    if right_tiebreaker is not None and right_tiebreaker not in right_cols:
        raise ValueError(
            f"right_tiebreaker {right_tiebreaker!r} must be one of right_cols"
        )
    probe = left.select(
        F.col(partition_key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        F.struct(*[F.col(c) for c in lcols]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    state = right.select(
        F.col(partition_key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(probe.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = state.unionByName(probe)
    order = [F.col("__ts").asc(), F.col("__is_probe").asc()]
    if right_tiebreaker is not None:
        # only orders STATE rows among themselves: probe vs state is already
        # decided by __is_probe, so the null placement of the probe rows'
        # (always-NULL) tiebreaker is inert — asc_nulls_first merely keeps
        # the total ordering explicit.
        order.append(F.col(f"__r_{right_tiebreaker}").asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_cols
        ],
    ).where(F.col("__is_probe") == 1)
    return carried.select(
        *[F.col("__left")[c].alias(c) for c in lcols],
        *[F.col(f"__rv_{c}").alias(c) for c in right_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    partition_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join, direction='nearest' (the pandas/polars merge_asof
    completion of J14's backward form): for each left row, the right row
    with the smallest |right_ts - left_ts| within the key; ties prefer
    the backward (<=) side. Optional ``tolerance_seconds`` nulls matches
    farther than the bound.

    Same single-shuffle union strategy as ``asof_join_backward``: probes
    and states co-partition on the key once; the backward candidate is a
    carry-forward ``last(ignorenulls)`` and the forward candidate a
    ``first(ignorenulls)`` over the following frame — two window sorts
    over ONE exchange, never a range join. The right side must be unique
    per (key, ts) (pre-dedup with ``keep_best_row``) so the carried
    struct is total-order deterministic.

    Adds ``__asof_delta_s`` (BIGINT seconds to the matched row, NULL on
    no match) alongside the requested ``right_cols``.
    """
    lcols = left.columns
    rstruct = F.struct(
        F.col("__ts").alias("__rts"),
        *[F.col(f"__r_{c}").alias(c) for c in right_cols],
    )
    probe = left.select(
        F.col(partition_key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        F.struct(*[F.col(c) for c in lcols]).alias("__left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_cols
        ],
    )
    state = right.select(
        F.col(partition_key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(probe.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = state.unionByName(probe).withColumn(
        "__state", F.when(F.col("__is_probe") == 0, rstruct)
    )
    base = Window.partitionBy("__k").orderBy(
        F.col("__ts").asc(), F.col("__is_probe").asc()
    )
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    carried = (
        unioned.select(
            "__k",
            "__ts",
            "__is_probe",
            "__left",
            F.last("__state", ignorenulls=True).over(w_back).alias("__b"),
            F.first("__state", ignorenulls=True).over(w_fwd).alias("__f"),
        )
        .where(F.col("__is_probe") == 1)
    )
    us = F.unix_micros(F.col("__ts"))
    bdelta = us - F.unix_micros(F.col("__b")["__rts"])
    fdelta = F.unix_micros(F.col("__f")["__rts"]) - us
    pick_back = F.col("__b").isNotNull() & (
        F.col("__f").isNull() | (bdelta <= fdelta)
    )
    chosen = F.when(pick_back, F.col("__b")).otherwise(F.col("__f"))
    delta_s = F.when(pick_back, bdelta).otherwise(fdelta) / F.lit(1_000_000)
    delta_s = F.floor(delta_s).cast("bigint")
    if tolerance_seconds is not None:
        chosen = F.when(delta_s <= tolerance_seconds, chosen)
        delta_s = F.when(delta_s <= tolerance_seconds, delta_s)
    return carried.select(
        *[F.col("__left")[c].alias(c) for c in lcols],
        *[chosen[c].alias(c) for c in right_cols],
        delta_s.alias("__asof_delta_s"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    suffix: str = "_r",
) -> DataFrame:
    """J15: interval-overlap join — pairs where ``[left_start, left_end]``
    and ``[right_start, right_end]`` overlap within the same ``key_cols``.

    A naive range-predicate join plans a per-key cartesian (O(n_k^2) row
    comparisons, BNL at the physical layer). This operator instead explodes
    each interval to the coarse ``bin_width``-sized bins it spans (interval
    columns must be numeric — epoch seconds/micros; callers convert), joins
    on (keys, bin) as a REAL equi-join, verifies the exact overlap
    predicate, and dedups pairs that met in several bins via the bin
    equality trick: a pair is emitted only from the bin containing
    ``greatest(start_l, start_r)`` — no distinct-shuffle needed.

    Scale: one shuffle on (keys, bin); bin fan-out is interval_len/bin_width
    per row (pick bin_width ~ the typical interval length). Skewed bins fall
    to AQE skew-join.
    """
    def binned(df: DataFrame, start: str, end: str, side: str) -> DataFrame:
        lo = (F.col(start) / bin_width).cast("long")
        hi = (F.col(end) / bin_width).cast("long")
        return df.withColumn("__bin", F.explode(F.sequence(lo, hi))).withColumn(
            "__side", F.lit(side)
        )

    lb = binned(left, left_start, left_end, "l")
    rcols = [
        (c, c if c not in set(left.columns) else f"{c}{suffix}")
        for c in right.columns
        if c not in key_cols
    ]
    renames = dict(rcols)
    r_start = renames.get(right_start, right_start)
    r_end = renames.get(right_end, right_end)
    rb = binned(
        right.select(*key_cols, *[F.col(c).alias(a) for c, a in rcols]),
        r_start,
        r_end,
        "r",
    )
    joined = lb.drop("__side").join(
        rb.drop("__side"), on=[*key_cols, "__bin"], how="inner"
    )
    overlap = (F.col(left_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(left_end)
    )
    anchor_bin = (
        F.greatest(F.col(left_start), F.col(r_start)) / bin_width
    ).cast("long")
    return joined.where(overlap & (F.col("__bin") == anchor_bin)).drop("__bin")


def bloom_prune(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    num_buckets: int = 1 << 20,
) -> DataFrame:
    """Pre-join runtime filtering: drop ``fact`` rows that cannot match
    ``dim`` BEFORE the join shuffle, using a broadcast set of the dim keys'
    hash buckets — the semi-join-reduction / Bloom-pruning technique with
    one hash function (no false negatives; false-positive rate ~
    |dim keys| / num_buckets, tunable).

    When the dim side's ROWS are too wide to broadcast but its distinct
    key-bucket set is small (<= num_buckets ids), the fact table is
    filtered map-side by a BroadcastHashJoin(LeftSemi) on the bucket id and
    only plausible rows pay the real join's exchange. False positives pass
    through to the real join — correctness unaffected (test-pinned).

    Spark's optimizer has an internal bloom_filter_agg for this
    (runtime row-level filtering), but it is not in the public function
    registry; the distinct-bucket broadcast is the public-API equivalent
    and stays entirely JVM-side.
    """
    dk = dim_key if dim_key is not None else fact_key
    buckets = dim.select(
        F.pmod(F.xxhash64(F.col(dk)), F.lit(num_buckets)).alias("__bucket")
    ).distinct()
    fact_bucket = F.pmod(F.xxhash64(F.col(fact_key)), F.lit(num_buckets))
    return fact.join(
        F.broadcast(buckets),
        on=[fact_bucket == F.col("__bucket")],
        how="left_semi",
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_edit: int = 2,
    block_chars: int = 4,
    suffix: str = "_r",
) -> DataFrame:
    """Blocked fuzzy string join (entity resolution): candidate pairs come
    from an EQUI-join on a cheap blocking key (lowercased first
    ``block_chars``), then the exact Levenshtein predicate verifies only
    the candidates — the standard blocking+verify shape that keeps fuzzy
    matching off the all-pairs cliff. Recall bound: matches whose first
    characters differ are missed; widen with multiple blocking passes
    (prefix + sorted-token prefix) when that matters.
    """
    rcols = [
        (c, c if c not in set(left.columns) else f"{c}{suffix}")
        for c in right.columns
    ]
    r = right.select(*[F.col(c).alias(a) for c, a in rcols])
    r_col = dict(rcols).get(right_col, right_col)
    lb = left.withColumn(
        "__blk", F.substring(F.lower(F.col(left_col)), 1, block_chars)
    )
    rb = r.withColumn(
        "__blk", F.substring(F.lower(F.col(r_col)), 1, block_chars)
    )
    return (
        lb.join(rb, on="__blk")
        .where(F.levenshtein(F.col(left_col), F.col(r_col)) <= max_edit)
        .drop("__blk")
    )


def adaptive_cell_size(
    n_points: int, extent: float = 360.0, target_per_cell: int = 4
) -> float:
    """Density-adaptive grid cell width: size cells so the EXPECTED
    per-cell population stays ~``target_per_cell`` as the point set
    grows — candidates per probe then stay O(9 * target) and the total
    candidate volume stays O(n) at every scale. With a FIXED cell size
    the 3x3-neighborhood join is O(n^2 / cells): the round-10 full-suite
    scale sweep measured geo_nearest_join going 1.9 s -> 501 s from 1x
    to 10x (and the equivalent DuckDB oracle OOMing outright) before
    this rule. Deterministic integer-and-sqrt arithmetic so a SQL oracle
    reproduces the identical width: ``extent / ceil(sqrt(n / target))``.

    ``target_per_cell`` trades drop-probability against candidate
    volume: the 3x3 neighborhood sees ~18x the per-cell mean (the lat
    axis has half the cells of the lon axis at a square cell), so even
    target 4 leaves P(empty neighborhood) ~ e^-72 — while target 32
    still produced ~560 candidates per probe at the 10x sweep point
    (374 s through the argmin SortAggregate); 4 cuts that 8x.
    """
    import math

    cells_axis = max(1, math.ceil(math.sqrt(max(n_points, 1) / float(target_per_cell))))
    return extent / float(cells_axis)


def nearest_neighbor_join(
    probes: DataFrame,
    points: DataFrame,
    probe_id: str,
    point_id: str,
    x: str = "lon",
    y: str = "lat",
    cell_size: float | None = 10.0,
    suffix: str = "_p",
    target_per_cell: int = 4,
) -> DataFrame:
    """Grid-bucketed nearest-neighbor join (the geocoding "closest station"
    shape, utils/geo.py nearest-match semantics re-expressed distributed).

    Each point lands in one (floor(x/c), floor(y/c)) grid cell; each probe
    fans out to its 3x3 cell neighborhood (explode factor 9 on the PROBE
    side only), candidates meet in ONE equi-join shuffle on the cell key,
    and the per-probe argmin is a plain min(struct(dist, id)) aggregate —
    no window, no all-pairs cross join. At 100 TB both sides shuffle once
    on a key whose cardinality you control via ``cell_size`` — and with
    ``cell_size=None`` the width adapts to the measured point density
    (``adaptive_cell_size``) so per-cell population, and therefore the
    candidate volume, stays LINEAR in the input instead of O(n^2/cells).
    NOTE: adaptive sizing ties the effective match radius (the 3x3
    neighborhood = 1 cell width) to point density — it SHRINKS as the
    point set grows, so whether a probe matches, and which neighbor it
    gets, can change between scales. Callers needing a fixed radius must
    pass an explicit ``cell_size``;
    hot cells are AQE-splittable because the agg is partial-aggregated.

    Distance is squared planar distance (dx*dx + dy*dy) in pure IEEE
    arithmetic — deterministic and engine-portable (no transcendentals).
    For geographic accuracy at production scale substitute haversine; the
    plan shape is identical. Probes with no point in their 3x3
    neighborhood are dropped (choose ``cell_size`` >= the max match radius
    you care about, or run a coarser fallback pass over the misses).

    Ties break on the smaller point id (min over the (dist, id) struct).

    Parallelism: BOTH inputs are fanned out (session.fan_out, a no-op at
    scale) before the cell join. The candidate join is a broadcast hash
    join, so its output parallelism equals the STREAMED side's scan
    granularity — and Catalyst is free to broadcast either side, so a
    single-row-group parquet scan on whichever side streams would run the
    whole 9x-candidate pipeline AND the argmin partial aggregate in one
    task (measured 11.4 s single-task vs 1.7 s fanned at sf0.1, 17M
    candidates). Note the argmin is a SortAggregate (struct is not a
    mutable hash-agg buffer type): each candidate partition is sorted by
    the group key before the partial min, which is CPU/spill-heavy but
    shuffle-light — only one row per (probe, partition) reaches the
    exchange. That is the right trade at 100 TB; the hash-friendly
    alternative (chained groupBy(probe, dist) -> groupBy(probe)) would
    shuffle the full candidate set instead.
    """
    from datagouvfr_data_pipelines_spark.session import fan_out

    # hash the fans on the id columns (round 12): same width, but an
    # explicit-key repartition skips the local sort every keyless
    # round-robin repartition pays (SPARK-23207)
    probes, points = fan_out(probes, probe_id), fan_out(points, point_id)
    if cell_size is None:
        # density-adaptive width (one count job on the filtered point
        # side — a driver scalar, same policy as k-means k); pass an
        # explicit cell_size to skip the count and pin the match radius
        cell_size = adaptive_cell_size(
            points.count(), target_per_cell=target_per_cell
        )
    pid = point_id if point_id not in set(probes.columns) else f"{point_id}{suffix}"
    pts = points.select(
        F.col(point_id).alias(pid),
        F.col(x).alias("__px"),
        F.col(y).alias("__py"),
        F.floor(F.col(x) / cell_size).alias("__cx"),
        F.floor(F.col(y) / cell_size).alias("__cy"),
    )
    off = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    pr = (
        probes.select(
            probe_id,
            F.col(x).alias("__qx"),
            F.col(y).alias("__qy"),
            F.floor(F.col(x) / cell_size).alias("__qcx"),
            F.floor(F.col(y) / cell_size).alias("__qcy"),
        )
        .withColumn("__dx", off)
        .withColumn("__dy", off)
        .withColumn("__cx", F.col("__qcx") + F.col("__dx"))
        .withColumn("__cy", F.col("__qcy") + F.col("__dy"))
    )
    dx = F.col("__qx") - F.col("__px")
    dy = F.col("__qy") - F.col("__py")
    cand = pr.join(pts, on=["__cx", "__cy"]).withColumn(
        "__sqdist", dx * dx + dy * dy
    )
    best = cand.groupBy(probe_id).agg(
        F.min(F.struct(F.col("__sqdist"), F.col(pid))).alias("__best")
    )
    return best.select(
        probe_id,
        F.col(f"__best.{pid}").alias(pid),
        F.col("__best.__sqdist").alias("sqdist"),
    )


def fuzzy_name_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_exprs: list,
    max_edit: int = 3,
    max_block: int = 64,
) -> DataFrame:
    """Entity-resolution self-match: candidate pairs from a BLOCKING key,
    verified by edit distance — never an all-pairs comparison.

    The classic record-linkage shape (Fellegi–Sunter blocking): rows that
    can match must share the deterministic ``block_exprs`` key (e.g. a
    name token + first letter), so candidate generation is one groupBy
    shuffle; pairs expand bucket-locally from the sorted (id, name) array
    (same JVM array-expansion kernel as the LSH and brand-affinity paths)
    and only candidates pay the O(len^2) ``levenshtein`` verify — which is
    a JVM built-in, no UDF. Blocks larger than ``max_block`` are dropped
    whole (the LSH hot-bucket guardrail: an over-common key means the
    blocking is non-discriminative there, and its pairs would dominate
    cost while being poor matches). Returns (id_a, id_b, dist), id_a<id_b.
    """
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__name"),
        *[e.alias(f"__b{i}") for i, e in enumerate(block_exprs)],
    )
    bcols = [f"__b{i}" for i in range(len(block_exprs))]
    blocks = (
        keyed.groupBy(*bcols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__id").alias("i"), F.col("__name").alias("s")))
            ).alias("rows")
        )
        .where((F.size("rows") >= 2) & (F.size("rows") <= max_block))
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("rows"),
            lambda x, i: F.transform(
                F.slice(F.col("rows"), i + 2, F.size(F.col("rows"))),
                lambda y: F.struct(
                    x["i"].alias("id_a"),
                    y["i"].alias("id_b"),
                    F.levenshtein(x["s"], y["s"]).alias("dist"),
                ),
            ),
        )
    )
    return (
        blocks.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.dist")
        .where(F.col("dist") <= max_edit)
        .distinct()
    )
