"""S9: XML ingestion without spark-xml (not in this container).

Reference: fuel-price PDV XML and election XML parsed row-by-row in Python
(carburants/scripts/reformat_prix.py:30-261;
elections/miom_mirroring/task_functions.py:279-501). The PDV file is
UDTF-shaped: one <pdv> element fans out into a parent row plus child tables
(prix, ruptures, horaires, services) — reproduced here as one distributed
parse per child spec.

Spark shape: ``binaryFile`` scan (one row per XML object) -> Arrow-batched
``mapInPandas`` running stdlib ``xml.etree`` per file -> typed rows. Files
parallelize across executors; a single giant XML file should be pre-split
upstream (the reference's files are per-day, well under executor memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_xml(
    spark: SparkSession,
    path_glob: str,
    row_tag: str,
    fields: dict[str, str],
    child_tag: str | None = None,
    child_fields: dict[str, str] | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Parse XML files into rows.

    ``fields`` maps output column -> attribute name (``@attr``) or child
    element text (``tag``) of each ``row_tag`` element. With ``child_tag``,
    emits one row per child element instead (joined to the parent's fields) —
    the explode of nested prix/rupture/horaires.

    ``mode``: "FAILFAST" (default) raises on malformed XML; "PERMISSIVE"
    emits one row per bad file with ``_corrupt_file`` set and all fields
    NULL (mirroring Spark CSV/JSON permissive semantics).
    """
    schema_cols = list(fields) + (list(child_fields or {}) if child_tag else [])
    schema = ", ".join(
        f"{c} string" for c in ["source_file", *schema_cols, "_corrupt_file"]
    )

    def extract(elem, spec: dict[str, str]) -> dict:
        out = {}
        for col, sel in spec.items():
            if sel.startswith("@"):
                out[col] = elem.get(sel[1:])
            else:
                child = elem.find(sel)
                out[col] = None if child is None else (child.text or "").strip()
        return out

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in it:
            rows = []
            for _, file_row in pdf.iterrows():
                try:
                    root = ET.fromstring(bytes(file_row["content"]))
                except ET.ParseError as e:
                    if mode == "PERMISSIVE":
                        rows.append(
                            {"source_file": file_row["path"], "_corrupt_file": str(e)}
                        )
                        continue
                    raise
                elems = (
                    [root] if root.tag == row_tag else root.iter(row_tag)
                )
                for elem in elems:
                    base = {"source_file": file_row["path"], **extract(elem, fields)}
                    if child_tag is None:
                        rows.append(base)
                    else:
                        for child in elem.iter(child_tag):
                            rows.append(
                                {**base, **extract(child, child_fields or {})}
                            )
            yield pd.DataFrame(
                rows, columns=["source_file", *schema_cols, "_corrupt_file"]
            )

    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select("path", "content").mapInPandas(parse, schema=schema)
