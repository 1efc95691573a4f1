"""Local replica of the driver's correctness gate.

Runs each catalog query on Spark AND its DuckDB oracle on the same parquet
tables, normalizes both results (columns sorted by name, rows sorted by all
columns), and compares values — exact for non-floats, near-exact for floats.
Keeping this strict locally means the driver's hash compare (which has NO
tolerance) only passes if our determinism policy (decimal sums, explicit
casts, total orderings) actually holds.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _norm_rows(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(normed, key=repr)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str


def _values_match(a, b, rel=1e-9) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=rel, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_match(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, spark_df, con, sql: str) -> CompareResult:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()
    sc, sr = _norm_rows(s_cols, s_rows)
    oc, orows = _norm_rows(o_cols, o_rows)
    if sc != oc:
        return CompareResult(name, False, f"columns differ: spark={sc} oracle={oc}")
    if len(sr) != len(orows):
        return CompareResult(name, False, f"row count: spark={len(sr)} oracle={len(orows)}")
    for i, (a, b) in enumerate(zip(sr, orows)):
        if not _values_match(a, b):
            return CompareResult(name, False, f"row {i} differs:\n  spark : {a}\n  oracle: {b}")
    # strict pass: also flag float cells that are close-but-not-identical,
    # since the driver hashes exact values
    for a, b in zip(sr, orows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float) and x != y and not (
                math.isnan(x) and math.isnan(y)
            ):
                return CompareResult(
                    name, True, f"WARN float not bit-identical: {x!r} vs {y!r}"
                )
    return CompareResult(name, True, "")
