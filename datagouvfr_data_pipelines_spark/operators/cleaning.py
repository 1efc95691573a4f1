"""Row-level cleaning / conforming operators (SURVEY §2.2).

All pure column expressions — JVM-side, whole-stage-codegen friendly. The
reference's unidecode/regex cleanup (schema/utils/consolidation.py:953-970,
rna/task_functions.py:64-77) becomes ``translate``/``regexp_replace`` chains;
no Python UDFs in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Accent-folding map covering the Latin-1/Latin-Extended chars the reference's
# unidecode calls actually encounter in French/European datasets.
_ACCENTS_SRC = "àáâãäåÀÁÂÃÄÅèéêëÈÉÊËìíîïÌÍÎÏòóôõöÒÓÔÕÖùúûüÙÚÛÜçÇñÑýÿŸœŒæÆ"
_ACCENTS_DST = "aaaaaaAAAAAAeeeeEEEEiiiiIIIIoooooOOOOOuuuuUUUUcCnNyyYoOaA"


def fold_accents(col: Column | str) -> Column:
    """unidecode-equivalent for the common European accent set (P9)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _ACCENTS_SRC, _ACCENTS_DST)


def clean_text(col: Column | str) -> Column:
    """P9: strip newlines/CRs, collapse whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(c, "[\\n\\r]+", " "), "\\s+", " "))


def conform_schema(df: DataFrame, target_columns: list[str],
                   types: dict[str, str] | None = None) -> DataFrame:
    """P10: align a frame to a target column list — add missing as NULL, drop
    extras, order columns (schema/utils/consolidation.py:977-1006)."""
    types = types or {}
    cols = []
    for c in target_columns:
        if c in df.columns:
            col = F.col(c)
        else:
            col = F.lit(None)
        if c in types:
            col = col.cast(types[c])
        cols.append(col.alias(c))
    return df.select(*cols)


def add_lineage(df: DataFrame, **constants) -> DataFrame:
    """P11: inject lineage/metadata columns (consolidation.py:993-1000).

    ``source_file`` is available via ``F.input_file_name()`` at read time.
    """
    for name, value in constants.items():
        df = df.withColumn(name, F.lit(value))
    return df


def null_policy(df: DataFrame, drop_subset: list[str] | None = None,
                fills: dict | None = None, inf_to_null: list[str] | None = None) -> DataFrame:
    """P4: inf->null, targeted dropna, per-column fills
    (dvf/explore/task_functions.py:516-524,749-750)."""
    for c in inf_to_null or []:
        df = df.withColumn(
            c, F.when(F.col(c).isin(float("inf"), float("-inf")), None).otherwise(F.col(c))
        )
    if drop_subset:
        df = df.na.drop(subset=drop_subset)
    if fills:
        df = df.na.fill(fills)
    return df


def melt(
    df,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "measure",
    value_name: str = "value",
):
    """Unpivot (pandas melt / SQL UNPIVOT): wide measure columns to long
    (id, measure, value) rows via a single stack projection — shuffle-free,
    the row-count multiplies by len(value_cols) at the scan. Values are
    cast to double (stack requires a uniform type across measures).
    """
    import pyspark.sql.functions as F

    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS DOUBLE)" for c in value_cols
    )
    stacked = df.selectExpr(
        *id_cols,
        f"stack({len(value_cols)}, {pairs}) AS (`{var_name}`, `{value_name}`)",
    )
    return stacked
