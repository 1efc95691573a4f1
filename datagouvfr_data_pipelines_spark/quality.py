"""Data-quality assertions (SURVEY §5.4 production-as-test contracts).

The reference encodes its invariants as inline asserts: uniqueness sanity
checks (`assert max(value_counts)==1`, dvf/explore:280,710,735), row-count
conservation (dvf/geoloc:319), schema expectations (elections/aggregation
:103), freshness guards (insee/sirene/stock:77-90, ST7). Here they are
engine-level checks that compute with ONE aggregate each (no collect of
data), raise a typed error, and can be chained inside a pipeline.
"""

from __future__ import annotations

import datetime as _dt

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class DataQualityError(AssertionError):
    """A pipeline invariant failed; message carries the evidence."""


def assert_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Uniqueness on key columns — one groupBy, reports worst offenders."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .orderBy(F.col("n").desc())
        .limit(5)
    )
    offenders = dups.collect()
    if offenders:
        raise DataQualityError(
            f"duplicate keys on {keys}: "
            + ", ".join(f"{tuple(r[k] for k in keys)}x{r['n']}" for r in offenders)
        )
    return df


def assert_row_conservation(
    before: DataFrame | int, after: DataFrame, tolerance: float = 0.0
) -> DataFrame:
    """Row-count conservation across a transform (dvf/geoloc:319)."""
    n_before = before if isinstance(before, int) else before.count()
    n_after = after.count()
    if abs(n_after - n_before) > tolerance * max(n_before, 1):
        raise DataQualityError(
            f"row conservation violated: {n_before} -> {n_after} "
            f"(tolerance {tolerance:.1%})"
        )
    return after


def assert_columns(df: DataFrame, required: list[str]) -> DataFrame:
    """Schema expectation (elections/aggregation:103)."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise DataQualityError(f"missing required columns: {missing}")
    return df


def assert_fresh(
    df: DataFrame,
    ts_col: str,
    max_age: _dt.timedelta,
    now: _dt.datetime | None = None,
) -> DataFrame:
    """ST7 freshness guard: newest row must be younger than ``max_age``
    (sirene/stock:77-90 reject-stale-stock)."""
    row = df.agg(F.max(ts_col).alias("newest")).collect()[0]
    newest = row["newest"]
    if newest is None:
        raise DataQualityError(f"freshness check on empty frame ({ts_col})")
    ref = now or _dt.datetime.now(tz=newest.tzinfo if hasattr(newest, "tzinfo") else None)
    if isinstance(newest, _dt.date) and not isinstance(newest, _dt.datetime):
        newest = _dt.datetime.combine(newest, _dt.time())
        ref = _dt.datetime.combine(ref.date() if isinstance(ref, _dt.datetime) else ref, _dt.time())
    if ref - newest > max_age:
        raise DataQualityError(
            f"stale data: newest {ts_col}={newest}, older than {max_age}"
        )
    return df


def assert_non_empty(df: DataFrame, context: str = "") -> DataFrame:
    if df.limit(1).count() == 0:
        raise DataQualityError(f"empty frame{': ' + context if context else ''}")
    return df


def quarantine_split(
    df: DataFrame, rules: dict[str, "F.Column"]
) -> tuple[DataFrame, DataFrame]:
    """Declarative expectations gate: ``rules`` maps rule name -> boolean
    Column a GOOD row satisfies. Returns ``(passed, violations)`` where
    violations carries every original column plus ``violated_rule`` (one row
    per rule broken, so a row failing two rules appears twice).

    One scan, no shuffle: all rules evaluate into a single array column and
    rows split on whether any entry survived. NULL rule results fail CLOSED
    (a null ``price > 0`` is a violation, not a pass) — at ingest scale the
    quarantine sink must catch the rows whose fields were too broken to
    evaluate, or they leak downstream as nulls.
    """
    checks = F.array(
        *[
            F.when(cond, F.lit(None).cast("string")).otherwise(F.lit(name))
            for name, cond in rules.items()
        ]
    )
    tagged = df.withColumn("__fails", F.filter(checks, lambda x: x.isNotNull()))
    passed = tagged.where(F.size("__fails") == 0).drop("__fails")
    violations = (
        tagged.where(F.size("__fails") > 0)
        .withColumn("violated_rule", F.explode("__fails"))
        .drop("__fails")
    )
    return passed, violations


def observe_quality(
    df: DataFrame, rules: dict[str, Column], name: str = "quality"
):
    """Zero-cost inline quality metrics via the Observation API: row count
    plus one violation count per rule are accumulated DURING whatever
    action the caller already runs — no extra scan, no extra job (the
    production alternative to count()-per-assertion, which doubles the
    read at 100 TB).

    Returns ``(df, observation)``; after the caller's first action,
    ``observation.get`` yields ``{"n_rows": ..., "bad_<rule>": ...}``.
    NULL rule results count as violations (fail-closed, same policy as
    ``quarantine_split``). Works on batch frames; for streams use the
    same expressions with ``df.observe(name, ...)`` and a streaming query
    listener.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(
            F.when(cond.isNull() | ~cond, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"bad_{rule}")
        for rule, cond in rules.items()
    ]
    return df.observe(obs, *metrics), obs


def schema_diff(df: DataFrame, expected_ddl: str) -> dict[str, list]:
    """Data-contract check: classify drift between a frame and an expected
    DDL schema ("a INT, b STRING, ...").

    Returns {"missing": [...], "extra": [...], "type_changed":
    [(col, expected, actual)]}. Complements ``conform_schema`` (which
    force-aligns) by REPORTING drift first — publish gates want the diff
    surfaced to a human before an automatic conform quietly nulls a
    renamed column at 100 TB.
    """
    from pyspark.sql.types import StructType

    expected = StructType.fromDDL(expected_ddl)
    exp = {f.name: f.dataType.simpleString() for f in expected.fields}
    act = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return {
        "missing": sorted(set(exp) - set(act)),
        "extra": sorted(set(act) - set(exp)),
        "type_changed": sorted(
            (c, exp[c], act[c]) for c in set(exp) & set(act) if exp[c] != act[c]
        ),
    }


def assert_schema_contract(df: DataFrame, expected_ddl: str) -> DataFrame:
    """Gate form of :func:`schema_diff`: raises DataQualityError naming
    every drift class; passes the frame through untouched when clean."""
    diff = schema_diff(df, expected_ddl)
    if any(diff.values()):
        raise DataQualityError(f"schema contract violated: {diff}")
    return df


def k_anonymity_audit(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int = 5,
) -> DataFrame:
    """Re-identification risk audit before publishing: every combination of
    the quasi-identifier columns that fewer than ``k`` rows share.

    An open-data release is k-anonymous w.r.t. its quasi-identifiers
    (public method, Sweeney 2002) when every published combination is
    shared by >= k individuals; the rows returned here are the ones a
    joiner with an external register could single out. One shuffle with
    map-side partial counts; empty result = safe to publish at that k.
    Pair with ``quarantine_split`` to hold risky rows back, or generalize
    (bin/coarsen) the offending columns and re-audit.
    """
    from pyspark.sql import functions as F

    return (
        df.groupBy(*quasi_identifiers)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
    )
