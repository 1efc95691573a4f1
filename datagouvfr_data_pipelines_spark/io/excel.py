"""S4/S21: Excel scan + multi-sheet sink.

The reference reads candidate resources with pandas ``read_excel``
(schema/utils/consolidation.py:940-947) and writes dep/region/national KPI
sheets (carburants/scripts/generate_kpis_rupture.py:178-183). Preferred
engine is pandas/openpyxl when installed; otherwise the pure-stdlib codec
in ``xlsx_codec.py`` takes over, so Excel IO works in ANY container. Both
paths return stringly-typed frames (the engine's defensive-ingest posture;
conform types downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datagouvfr_data_pipelines_spark.io.xlsx_codec import read_xlsx, write_xlsx


def _has_openpyxl() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def _rows_to_pandas(rows: list[list[str]]):
    import pandas as pd

    if not rows:
        return pd.DataFrame()
    header, data = rows[0], rows[1:]
    return pd.DataFrame(data, columns=header, dtype=str)


def read_excel(
    spark: SparkSession, path: str, sheet_name: int | str = 0, dtype=str
) -> DataFrame:
    """S4: driver-side Excel read -> DataFrame; first row is the header."""
    if _has_openpyxl():
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name, dtype=dtype)
    else:
        with open(path, "rb") as f:
            pdf = _rows_to_pandas(read_xlsx(f.read(), sheet_name))
    return spark.createDataFrame(pdf)


def read_excel_distributed(
    spark: SparkSession,
    path_glob: str,
    schema: str,
    sheet_name: int | str = 0,
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
    sheet_name) -> pandas.DataFrame`` defaults to pandas/openpyxl when
    available, else the stdlib codec; custom parsers must be
    cloudpickle-shippable.
    """
    if parser is None:
        if _has_openpyxl():

            def parser(content: bytes, sheet):
                import io as _io

                import pandas as pd

                return pd.read_excel(_io.BytesIO(content), sheet_name=sheet, dtype=str)

        else:

            def parser(content: bytes, sheet):
                return _rows_to_pandas(read_xlsx(content, sheet))

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
    """S21: multi-sheet Excel sink for small aggregates (KPI exports).
    Header row + stringified values; driver-side by design (KPI sheets are
    end products, not data-plane artifacts)."""
    if _has_openpyxl():
        import pandas as pd

        with pd.ExcelWriter(path) as writer:
            for sheet, df in frames.items():
                df.toPandas().to_excel(writer, sheet_name=sheet, index=False)
        return
    sheets = {}
    for sheet, df in frames.items():
        rows = [list(df.columns)]
        rows += [["" if v is None else str(v) for v in r] for r in df.collect()]
        sheets[sheet] = rows
    write_xlsx(sheets, path)
