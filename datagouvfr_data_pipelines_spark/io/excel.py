"""S4/S21: Excel scan + multi-sheet sink (driver-side, small files only).

The reference reads candidate resources with pandas ``read_excel``
(schema/utils/consolidation.py:940-947) and writes dep/region/national KPI
sheets (carburants/scripts/generate_kpis_rupture.py:178-183). Excel files in
these pipelines are small end products / inputs, so driver-side pandas is
the right tier — gated behind an import check because the engine container
ships no openpyxl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _require_excel_engine():
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Excel IO needs openpyxl (not installed in this container); "
            "install it or convert the file to CSV upstream"
        ) from e


def read_excel(
    spark: SparkSession, path: str, sheet_name=0, dtype=str
) -> DataFrame:
    """S4: driver-side Excel read -> DataFrame (stringly-typed like the
    reference's defensive ingest; conform types downstream)."""
    _require_excel_engine()
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet_name, dtype=dtype)
    return spark.createDataFrame(pdf)


def write_excel_sheets(frames: dict[str, DataFrame], path: str) -> None:
    """S21: multi-sheet Excel sink for small aggregates (KPI exports)."""
    _require_excel_engine()
    import pandas as pd

    with pd.ExcelWriter(path) as writer:
        for sheet, df in frames.items():
            df.toPandas().to_excel(writer, sheet_name=sheet, index=False)
