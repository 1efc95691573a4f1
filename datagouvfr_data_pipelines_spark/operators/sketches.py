"""Approximate distinct-count sketches (HLL / Theta) — the 100 TB scale
path for distinct-heavy rollups.

Exact distinct counts (`distinct_count_two_phase`, A7) re-shuffle the full
(group, value) universe on every rebuild. At 100 TB the right design is a
MERGEABLE sketch state per ingest partition, persisted next to the
algebraic quartet of ``partial_agg_states``:

- **HLL** (``hll_sketch_agg``): ~1.5 KB per group at lgK=12 for ~1.6%
  relative error, union-mergeable — daily states roll up to months/years
  without rescanning history.
- **Theta** (``theta_sketch_agg``): supports UNION, INTERSECTION and
  DIFFERENCE — set-overlap analytics (audience reach, cross-segment
  overlap, churn deltas) with NO join over the raw keys.

Both are Apache DataSketches implementations surfaced as Spark built-in
aggregates (JVM-side, partial-aggregated map-side like any other agg), so
a sketch rollup plans exactly like a sum rollup: one shuffle of
group+state, never the value universe.

Estimates are deterministic functions of the input SET (hash-based,
order/partitioning independent — pinned by test), but NOT portable to
other engines' HLL variants, so the catalog queries built on these are
rows-only checks; error bounds and merge-vs-direct equivalence are pinned
by unit tests instead (tests/test_sketches.py).

Reference behavior: the site-metrics pipeline counts distinct visitors
per day and re-aggregates to months (dgv/metrics/sql/create_tables.sql)
— exact at reference scale, sketch-backed here for the 1000-executor
path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_LGK = 12  # 2^12 buckets ≈ 1.6% rel. error, ~1.5 KB dense state


def hll_states(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group HLL distinct-count state (binary, mergeable).

    One partial-aggregated shuffle of (group, ~1.5 KB state); the value
    column itself never crosses the wire pre-hashed. Persist these per
    batch/day and combine with :func:`hll_merge` — incremental distinct
    without history rescans.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("st_hll")
    )


def hll_merge(states: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Union per-batch HLL states into one state per group (associative +
    commutative — any merge tree yields the same sketch estimate)."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*group_cols).agg(
        F.hll_union_agg("st_hll").alias("st_hll")
    )


def hll_estimate(states: DataFrame, alias: str = "n_distinct_est") -> DataFrame:
    """Finalize: estimated distinct count per group (BIGINT)."""
    return states.withColumn(alias, F.hll_sketch_estimate("st_hll")).drop(
        "st_hll"
    )


def theta_states(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group Theta distinct-count state — like HLL but closed under
    intersection/difference as well as union."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col, F.lit(lgk)).alias("st_theta")
    )


def theta_overlap(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Set-overlap analytics between two keyed datasets WITHOUT joining
    their raw keys: per group, estimated |A|, |B|, |A ∪ B|, |A ∩ B| and
    |A \\ B| from two theta sketches.

    The raw value universes reduce to one ~KB state per group per side
    before the (tiny) full-outer state join — at 100 TB this replaces a
    massive distinct-key join with two sketch rollups. Groups present on
    one side only get an empty sketch on the other (estimates 0 / full).
    """
    sa = theta_states(a, group_cols, value_col, lgk).withColumnRenamed(
        "st_theta", "st_a"
    )
    sb = theta_states(b, group_cols, value_col, lgk).withColumnRenamed(
        "st_theta", "st_b"
    )
    joined = sa.join(sb, on=group_cols, how="full_outer")
    # theta_union/intersection need non-null sketches: groups missing on
    # one side coalesce to the empty sketch (theta agg over zero rows),
    # broadcast as a one-row constant.
    spark = a.sparkSession
    empty_df = (
        spark.range(1)
        .select(F.lit(None).cast("long").alias("v"))
        .where(F.col("v").isNotNull())
        .agg(F.theta_sketch_agg("v", F.lit(lgk)).alias("st_empty"))
    )
    joined = joined.crossJoin(F.broadcast(empty_df))
    a_sk = F.coalesce(F.col("st_a"), F.col("st_empty"))
    b_sk = F.coalesce(F.col("st_b"), F.col("st_empty"))
    return joined.select(
        *group_cols,
        F.theta_sketch_estimate(a_sk).alias(f"n{suffixes[0]}"),
        F.theta_sketch_estimate(b_sk).alias(f"n{suffixes[1]}"),
        F.theta_sketch_estimate(F.theta_union(a_sk, b_sk)).alias("n_union"),
        F.theta_sketch_estimate(F.theta_intersection(a_sk, b_sk)).alias(
            "n_intersect"
        ),
        F.theta_sketch_estimate(F.theta_difference(a_sk, b_sk)).alias(
            f"n_only{suffixes[0]}"
        ),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile states (deterministic bottom-k row sample)
# ---------------------------------------------------------------------------
#
# The algebraic quartet in aggregates.partial_agg_states covers count/sum/
# min/max but not quantiles, so incremental rollups could not maintain a
# median or p95 without rescanning history. This closes that: the state per
# group is the k rows with the SMALLEST xxhash64(row id) — a deterministic
# uniform row sample (every row's inclusion depends only on its id hash and
# the other hashes present, not on partitioning or arrival order), and
# bottom-k-by-hash is associative, so states merge exactly: merging batch
# states equals building the state over the union (test-pinned, not just
# approximately). Quantile estimates off a k-sample have rank error
# ~1/sqrt(k) (k=1024 -> ~3 percentile points, Dvoretzky–Kiefer–Wolfowitz).
# State is ~16 B x k per group, same ballpark as an HLL at lgK=12.


def portable_id_hash(col) -> "F.Column":
    """Two-round LCG mix of an integer id, mod 2^31-1 — an engine-portable
    stand-in for xxhash64 where the hash only drives uniform SAMPLING (not
    adversarial collision resistance). ANSI arithmetic only, so a DuckDB
    oracle reproduces it bit-for-bit:
    ``((id % 2147483647 * 1103515245 + 12345) % 2147483647
    * 784588716 + 997) % 2147483647``.
    The id is reduced mod 2^31-1 BEFORE the first multiply, so the mix is
    overflow-safe for the FULL int64 id range under ANSI BIGINT on both
    engines (the round-10 suite-wide scale sweep crashed here: offset
    fact keys above 2^32 pushed id*1103515245 past 2^63 — exactly what
    64-bit ids at real scale do). For ids < 2^31 the pre-reduction is the
    identity, so every existing oracle value is unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    h1 = F.pmod(
        F.pmod(c.cast("long"), F.lit(2147483647)) * F.lit(1103515245)
        + F.lit(12345),
        F.lit(2147483647),
    )
    return F.pmod(h1 * F.lit(784588716) + F.lit(997), F.lit(2147483647))


def quantile_sample_states(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 1024,
    state_col: str = "st_qsample",
    portable: bool = False,
) -> DataFrame:
    """Per-group mergeable quantile state: array<struct<h,v>> of the k
    smallest-hash rows, hash-ascending. Built skew-safely with the
    two-stage salted bottom-k (grouped_top_k) so a hot group never funnels
    through one reducer.

    ``portable=True`` samples by :func:`portable_id_hash` (ANSI-arithmetic
    LCG) instead of xxhash64, making the whole state — and any quantile
    estimated from it — reproducible in a DuckDB oracle; sampling quality
    is equivalent for rank estimation (uniform mixing is all the bound
    needs)."""
    from datagouvfr_data_pipelines_spark.operators.aggregates import grouped_top_k

    h = portable_id_hash(id_col) if portable else F.xxhash64(F.col(id_col))
    proj = df.select(
        *group_cols,
        h.alias("__h"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # total order (h, v): hash collisions with distinct values would
    # otherwise make the k-th slot partition-dependent
    kept = grouped_top_k(
        proj,
        group_cols,
        [F.col("__h").asc(), F.col("__v").asc()],
        k=k,
        tiebreak_col="__h",
        rank_alias="__rank",
    )
    return kept.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__h").alias("h"), F.col("__v").alias("v")))
        ).alias(state_col)
    )


def quantile_sample_merge(
    states: list[DataFrame],
    group_cols: list[str],
    k: int = 1024,
    state_col: str = "st_qsample",
) -> DataFrame:
    """Exact state merge: union, re-take the k smallest hashes per group.
    Associative and order-independent — any merge tree gives the same
    state as a direct build over all rows."""
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return (
        u.select(*group_cols, F.explode(state_col).alias("e"))
        .groupBy(*group_cols)
        .agg(
            F.slice(F.sort_array(F.collect_list("e")), 1, k).alias(state_col)
        )
    )


def quantile_estimate(
    states: DataFrame,
    probs: list[float],
    group_cols: list[str],
    state_col: str = "st_qsample",
    prefix: str = "q",
) -> DataFrame:
    """Quantiles from the sampled values: linear interpolation at rank
    p*(n-1) over the value-sorted sample (the same rule as percentile_cont
    / F.percentile applied to the sample array) — pure column expressions."""
    vals = F.array_sort(F.transform(F.col(state_col), lambda e: e["v"]))
    n = F.size(vals)
    cols = []
    for p in probs:
        pos = F.lit(p) * (n.cast("double") - 1)
        lo = F.floor(pos).cast("int")
        frac = pos - lo.cast("double")
        v_lo = F.element_at(vals, lo + 1)
        v_hi = F.element_at(vals, F.least(lo + 2, n))
        est = v_lo + frac * (v_hi - v_lo)
        cols.append(
            F.when(n > 0, est).alias(f"{prefix}{str(p).replace('.', '_')}")
        )
    return states.select(*group_cols, *cols)


def topk_state(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Per-group top-k candidate state: the k best (score, id) rows.

    Top-k is a mergeable summary (union of states re-ranked is exact —
    any row outside a batch's local top-k can never enter the merged
    top-k), which makes interactive / incremental search sessions cheap:
    maintain the state per batch and merge on demand instead of
    rescanning the corpus per query refinement (cf. the incremental
    top-k literature, EDBT'20). Skew-safe: built on ``grouped_top_k``
    (salted partial top-k per bucket, then an exact final pass over
    group x fan x k survivors) so a hot group never serializes through
    one reducer — same total order (score desc, id asc) in both stages,
    so the state equals the plain-window form.
    """
    from datagouvfr_data_pipelines_spark.operators.aggregates import (
        grouped_top_k,
    )

    return grouped_top_k(
        df,
        group_cols,
        [F.col(score_col).desc(), F.col(id_col).asc()],
        k,
        tiebreak_col=id_col,
        rank_alias="__rk",
    ).drop("__rk")


def topk_merge(
    states: list[DataFrame], group_cols: list[str], score_col: str,
    id_col: str, k: int,
) -> DataFrame:
    """Merge per-batch top-k states into the exact global top-k: union
    the (≤ k per group per batch) candidates — |states|·k rows per
    group, never corpus-sized — and re-rank once."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return topk_state(out, group_cols, score_col, id_col, k)


def hll_portable_states(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Hand-rolled Flajolet HLL registers with the PORTABLE hash family —
    the oracle-checkable twin of :func:`hll_states` (same role as
    g_pagerank_exact next to g_pagerank: the DataSketches binary state has
    no SQL twin, the register math does).

    m=64 registers over ``portable_id_hash`` (31-bit): bucket = h mod 64,
    rho = leading-zero rank of the remaining 25-bit suffix computed as an
    INTEGER comparison sum (no log), register = max(rho) per (group,
    bucket). One partial-aggregated shuffle of (group, bucket) pairs —
    64 tiny rows per group, mergeable by max like any HLL."""
    m = 64
    h = portable_id_hash(value_col)
    bucket = F.pmod(h, F.lit(m))
    # h < 2^31 is exactly representable in double; /64 is a power-of-two
    # scale, so floor(h/64) is the exact integer quotient
    rest = F.floor(h / m).cast("long")
    bitlen = sum(
        [(rest >= F.lit(1 << k)).cast("int") for k in range(25)],
        F.lit(0),
    )
    rho = (F.lit(26) - bitlen).alias("rho")
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_portable_estimate(
    states: DataFrame, group_cols: list[str], alias: str = "n_distinct_est"
) -> DataFrame:
    """Finalize portable-HLL registers: harmonic-mean estimate with the
    standard small-range linear-counting correction.

    Exactness note: each register term is 1/2^reg — a dyadic rational
    with <= 26 fractional bits — and there are at most 64 of them, so the
    per-group SUM is EXACT in double under ANY summation order (<= 33
    significant bits), which is what makes the estimate bit-identical to
    a SQL oracle without quantization. Absent buckets contribute 2^0 = 1
    each: S = S_present + (m - n_present), V (zero registers) =
    m - n_present."""
    m = 64
    s = F.col("__s") + (F.lit(float(m)) - F.col("__n"))
    v = F.lit(m) - F.col("__n").cast("int")
    raw = F.lit(0.709) * m * m / s
    linear = F.lit(float(m)) * (
        F.log(F.lit(float(m))) - F.log(v.cast("double"))
    )
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(raw)
    return (
        states.groupBy(*group_cols)
        .agg(
            F.sum(
                F.lit(1.0)
                / F.expr("cast(shiftleft(1L, cast(reg as int)) as double)")
            ).alias("__s"),
            F.count(F.lit(1)).cast("double").alias("__n"),
        )
        .select(
            *group_cols,
            v.alias("zero_registers"),
            est.alias(alias),
        )
    )


def kmv_grouped_bottom_k(
    df: DataFrame, group_cols: list[str], id_col: str, k: int = 128
) -> DataFrame:
    """Per-group KMV state: the k smallest ``portable_id_hash`` values of
    the distinct ids WITHIN each group — :func:`kmv_bottom_k` with a
    partitioned rank instead of a global sort-limit, so the state build is
    one distinct shuffle plus a per-group (never global) window. Returns
    (group_cols..., h)."""
    from pyspark.sql import Window

    h = portable_id_hash(id_col)
    d = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_bottom_k(df: DataFrame, id_col: str, k: int = 128) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch over the portable hash:
    the k smallest ``portable_id_hash`` values of the distinct ids — a
    ~k-row mergeable state whose union/intersection algebra estimates
    |A∪B| and |A∩B| without joining raw keys (Beyer et al., SIGMOD'07;
    the deterministic, oracle-checkable twin of the Theta sketch, same
    role hll_portable_states plays for HLL). Merge = union the states
    and re-take the bottom k. Estimator: with the k-th minimum m_k
    normalized by the hash modulus, distinct ≈ (k-1)/m_k."""
    h = portable_id_hash(id_col)
    return (
        df.select(h.alias("h")).distinct().orderBy("h").limit(k)
    )
