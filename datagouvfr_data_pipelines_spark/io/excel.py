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


def read_excel_distributed(
    spark: SparkSession,
    path_glob: str,
    schema: str,
    sheet_name=0,
    parser=None,
) -> DataFrame:
    """S4 scale path: many/large Excel resources read EXECUTOR-side.

    The reference loops pandas.read_excel over schema-candidate resources
    on one machine (consolidation.py:940-947); when a schema has thousands
    of Excel resources that loop is the bottleneck. Distributed form:
    ``binaryFile`` scan of the glob (one task per file) -> ``mapInPandas``
    parsing each file's bytes -> rows, with a ``source_file`` lineage
    column appended.

    ``schema`` is the output DDL WITHOUT source_file (distributed parsing
    cannot infer schemas without an extra driver pass — explicit is the
    contract, matching read_fixed_width). ``parser(content: bytes,
    sheet_name) -> pandas.DataFrame`` defaults to pandas.read_excel via
    openpyxl (gated: not in this container); tests inject a fake parser to
    exercise the plumbing. A custom parser must be cloudpickle-shippable.
    """
    import pandas as pd

    if parser is None:
        _require_excel_engine()

        def parser(content: bytes, sheet):
            import io as _io

            return pd.read_excel(_io.BytesIO(content), sheet_name=sheet, dtype=str)

    out_schema = schema + ", source_file string"
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def run(it):
        for pdf in it:
            for path, content in zip(pdf["path"], pdf["content"]):
                parsed = parser(bytes(content), sheet_name)
                parsed = parsed.assign(source_file=path)
                yield parsed

    return files.mapInPandas(run, schema=out_schema)


def write_excel_sheets(frames: dict[str, DataFrame], path: str) -> None:
    """S21: multi-sheet Excel sink for small aggregates (KPI exports)."""
    _require_excel_engine()
    import pandas as pd

    with pd.ExcelWriter(path) as writer:
        for sheet, df in frames.items():
            df.toPandas().to_excel(writer, sheet_name=sheet, index=False)
