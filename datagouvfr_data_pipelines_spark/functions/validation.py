"""F3: per-resource validation with modification-date caching.

Reference: each (resource x schema-version) is validated through the Validata
HTTP API, skipped when the stored report is newer than the resource's
last_modified (schema/utils/consolidation.py:292-361). The HTTP service is a
driver-side connector; the ENGINE part — deciding what to validate and
merging results back — is the cache-join pattern below, identical in shape
to the geocode cascade.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

VALIDATION_SCHEMA = "resource_id string, is_valid boolean, n_errors int, validated_at string"


def validate_resources(
    resources: DataFrame,
    report_cache: DataFrame | None,
    validator: Callable[[pd.Series], pd.DataFrame] | None = None,
    id_col: str = "resource_id",
    modified_col: str = "last_modified",
    size_col: str | None = None,
    max_bytes: int = 100_000_000,
) -> DataFrame:
    """Validate only what changed: rows whose cached report is at least as
    recent as their ``last_modified`` reuse the cache; the rest go through
    ``validator`` (mapInPandas batch). Returns one report row per resource.

    ``report_cache`` schema: resource_id, is_valid, n_errors, validated_at.

    When ``size_col`` is given, resources above ``max_bytes`` are never
    sent to the validator (the reference refuses to download >10^8-byte
    files into Validata, consolidation.py:305-308); they come back with
    ``validated_at='skipped:size'`` and NULL is_valid so downstream floors
    treat them as unvalidated rather than invalid.
    """
    if validator is None:
        def validator(ids: pd.Series) -> pd.DataFrame:
            import zlib

            h = ids.map(lambda s: zlib.crc32(str(s).encode()))
            return pd.DataFrame(
                {
                    "resource_id": ids,
                    "is_valid": (h % 5 != 0),
                    "n_errors": (h % 5).astype("int32"),
                    "validated_at": "fake-run",
                }
            )

    oversized = None
    if size_col is not None:
        oversized = (
            resources.where(F.col(size_col) > max_bytes)
            .select(
                F.col(id_col).alias("resource_id"),
                F.lit(None).cast("boolean").alias("is_valid"),
                F.lit(None).cast("int").alias("n_errors"),
                F.lit("skipped:size").alias("validated_at"),
            )
        )
        resources = resources.where(
            F.col(size_col).isNull() | (F.col(size_col) <= max_bytes)
        )
    base = resources.select(
        F.col(id_col).alias("resource_id"), F.col(modified_col).alias("__mod")
    )
    if report_cache is not None:
        joined = base.join(report_cache, on="resource_id", how="left")
        fresh = joined.where(
            F.col("validated_at").isNotNull() & (F.col("validated_at") >= F.col("__mod"))
        ).select("resource_id", "is_valid", "n_errors", "validated_at")
        stale = joined.where(
            F.col("validated_at").isNull() | (F.col("validated_at") < F.col("__mod"))
        ).select("resource_id")
    else:
        fresh = None
        stale = base.select("resource_id")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield validator(pdf["resource_id"])

    validated = stale.mapInPandas(run, schema=VALIDATION_SCHEMA)
    out = validated if fresh is None else fresh.unionByName(validated)
    return out if oversized is None else out.unionByName(oversized)


def comparer_versions(version: str) -> list[float]:
    """Semver-ish sort key: numeric parts compare as ints, non-numeric
    parts (``latest``, ``beta``…) sort LAST via +inf — the reference's
    comparator (schema/utils/consolidation.py:92-93), re-expressed without
    numpy."""
    return [
        int(part) if part.isnumeric() else float("inf")
        for part in version.split(".")
    ]


def drop_versions_sample(
    versions: list[str], nb_to_keep: int = 5, level: int = 0
) -> list[str]:
    """Which schema versions NOT to validate: keep a bounded sample of
    ``nb_to_keep`` representative versions and return the rest, so
    consolidation's Validata work stays O(nb_to_keep) per schema no matter
    how many historical versions the registry carries. Exact behavioral
    parity with the reference (schema/utils/consolidation.py:96-125):

    - sample = the latest version of each of the ``nb_to_keep`` most
      recent majors;
    - fewer majors than ``nb_to_keep``: keep the latest of each major and
      top up with the overall most recent remaining versions;
    - a SINGLE major: promote minors to the major role and recurse one
      level deeper (so ``1.0.x``-only histories sample across patch
      levels); at level 2 (single major.minor.patch lineage) nothing is
      dropped. NOTE (faithful quirk): the reference's recursion resets
      ``nb_to_keep`` to its default of 5 — reproduced here so both
      implementations agree on every input.

    Returns the versions to DROP, preserving input order.
    """
    _versions = sorted(versions, key=comparer_versions)
    majors = {".".join(v.split(".")[: level + 1]) for v in _versions}
    if len(majors) == 1:
        if level == 2:
            return []
        return drop_versions_sample(versions, level=level + 1)
    latest_each_major = sorted(
        (
            # sorted(...)[-1], not max(): on key ties (e.g. "1.0" vs "1.00")
            # the reference takes the LAST of the stable sort, max the first
            sorted(
                [v for v in _versions if ".".join(v.split(".")[: level + 1]) == m],
                key=comparer_versions,
            )[-1]
            for m in majors
        ),
        key=comparer_versions,
    )
    if len(latest_each_major) >= nb_to_keep:
        keep = latest_each_major[-nb_to_keep:]
        return [v for v in versions if v not in keep]
    for v in reversed(_versions):
        if len(latest_each_major) == nb_to_keep:
            break
        if v not in latest_each_major:
            latest_each_major.append(v)
    return [v for v in versions if v not in latest_each_major]


def luhn_valid(col) -> "Column":
    """Luhn mod-10 check as pure column expressions — validates SIREN (9
    digits) / SIRET (14 digits) style identifiers at scan speed, no UDF.

    Standard algorithm (public, ISO/IEC 7812): from the RIGHT, double
    every second digit, subtract 9 when the double exceeds 9, and require
    the total to be divisible by 10. Non-digit or empty strings are
    invalid (false), so the check composes directly with quarantine_split.
    Ref context: SIRENE identifiers ship in the reference's INSEE stock
    pipeline (insee/sirene/stock/task_functions.py) untested; here the
    checksum is a first-class validator.
    """
    import pyspark.sql.functions as F

    c = F.col(col) if isinstance(col, str) else col
    digits = F.reverse(F.split(c, ""))
    term = F.transform(
        digits,
        lambda ch, i: F.when(
            i % 2 == 1,
            # doubled position: 2d - 9 when 2d > 9, i.e. d > 4
            (F.ascii(ch) - 48) * 2
            - F.when((F.ascii(ch) - 48) > 4, 9).otherwise(0),
        ).otherwise(F.ascii(ch) - 48),
    )
    total = F.aggregate(term, F.lit(0), lambda acc, x: acc + x)
    return (
        c.rlike("^[0-9]+$") & (F.pmod(total, F.lit(10)) == 0)
    ).alias("luhn_valid")
