"""Schema-consolidation engine (SURVEY §3.3, schema/).

Reference: per schema version — read each candidate file with sniffed
encoding/separator, clean column names, align to the Table Schema column
list, inject lineage, require mandatory columns, union, sort by
last_modified desc, dedup by primaryKey, emit only if >= 5 contributing
files (schema/utils/consolidation.py:818-1071).

Spark shape: a parameterized conform -> unionByName -> window-dedup job over
a schema-registry entry. Validation/discovery (HTTP) stay driver-side
connectors; this module is the distributed core.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datagouvfr_data_pipelines_spark.operators.cleaning import clean_text, conform_schema
from datagouvfr_data_pipelines_spark.operators.setops import union_align
from datagouvfr_data_pipelines_spark.operators.windows import keep_best_row


@dataclass
class SchemaVersion:
    """One Table Schema version from the registry
    (consolidation.py:878-893 fields/required/primaryKey)."""

    columns: list[str]
    types: dict[str, str] = field(default_factory=dict)
    required: list[str] = field(default_factory=list)
    primary_key: list[str] | None = None
    min_files: int = 5


def conform_file(
    df: DataFrame,
    schema: SchemaVersion,
    resource_id: str,
    last_modified: str,
    clean_cols: list[str] | None = None,
) -> DataFrame:
    """P9+P10+P11 per input file: clean text cols, align to the target
    column list (missing -> typed NULL, extras dropped), add lineage."""
    for c in clean_cols or []:
        if c in df.columns:
            df = df.withColumn(c, clean_text(c))
    out = conform_schema(df, schema.columns, schema.types)
    return out.withColumns(
        {
            "resource_id": F.lit(resource_id),
            "last_modified": F.lit(last_modified),
        }
    )


def consolidate(
    conformed: list[DataFrame], schema: SchemaVersion
) -> DataFrame | None:
    """U1 + row gate + O5 deterministic dedup.

    Returns None below the contributing-files floor (consolidation.py:39,
    1027). Dedup keeps the most recently modified row per primaryKey — the
    window form; ``dropDuplicates`` after sort is forbidden (SURVEY §4 #4).
    """
    if len(conformed) < schema.min_files:
        return None
    unioned = union_align(conformed)
    for c in schema.required:
        unioned = unioned.where(F.col(c).isNotNull())
    keys = schema.primary_key or schema.columns
    return keep_best_row(
        unioned,
        keys,
        [F.col("last_modified").desc(), F.col("resource_id").asc()],
    )
