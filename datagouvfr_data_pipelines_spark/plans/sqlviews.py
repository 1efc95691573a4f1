"""SQL front door: run a Postgres-style materialized-view pyramid as
Spark SQL text.

The reference serves its metrics through a pyramid of Postgres
materialized views (dgv/metrics/sql/create_tables.sql:127-342 — daily
full-outer merges, joins on aggregated subqueries, monthly rollups). The
recipe compiler (plans/recipe.py) covers the dict-spec path; this module
covers the OTHER porting path: paste the view SQL nearly verbatim and run
it on Spark. Each view's ``SELECT`` executes via ``spark.sql`` and
registers as a temp view, so later views reference earlier ones exactly
like the Postgres dependency chain — and because ``spark.sql`` emits an
ordinary Catalyst plan, every engine guarantee (pushdown, partial
aggregation, AQE join planning) applies unchanged: the SQL form and the
DataFrame-API form of the same view compile to the same physical plan
(test-pinned).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def run_sql_views(
    spark: SparkSession,
    views: dict[str, str],
    base: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Execute an ORDERED name -> SELECT mapping as a view pyramid.

    ``base`` DataFrames register first (the raw tables the SQL references);
    each view registers under its name before the next runs. Returns every
    view's DataFrame — materialize whichever levels the caller persists
    (the Spark analogue of REFRESH MATERIALIZED VIEW is re-running the
    pyramid; plans are lazy so unconsumed levels cost nothing).
    """
    for name, df in (base or {}).items():
        df.createOrReplaceTempView(name)
    out: dict[str, DataFrame] = {}
    for name, sql in views.items():
        df = spark.sql(sql)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


_CREATE_RE = re.compile(
    r"CREATE\s+(?:MATERIALIZED\s+)?VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.]+)\s+AS\s+(?P<select>.*?);",
    re.IGNORECASE | re.DOTALL,
)


def parse_view_script(
    script: str, strip_schemas: tuple[str, ...] = ()
) -> dict[str, str]:
    """Port a Postgres ``CREATE MATERIALIZED VIEW ... AS SELECT ...;``
    script to the ordered mapping :func:`run_sql_views` takes — the
    paste-the-DDL path for reference users. ``strip_schemas`` removes
    schema qualifiers (e.g. ``metric.``) that Spark temp views don't have;
    statement order in the script defines dependency order, as in the
    original DDL. Comments (``-- ...``) are dropped."""
    script = re.sub(r"--[^\n]*", "", script)
    views: dict[str, str] = {}
    for m in _CREATE_RE.finditer(script):
        name, select = m.group("name"), m.group("select").strip()
        for s in strip_schemas:
            name = name.removeprefix(s)
            select = _strip_qualifier(select, s)
        views[name] = select
    return views


def _strip_qualifier(select: str, qualifier: str) -> str:
    """Remove ``qualifier`` (e.g. ``metric.``) only where it actually
    qualifies an identifier: at a word boundary, followed by an identifier
    character, and OUTSIDE single-quoted string literals. A blind
    ``str.replace`` would also mangle literals like ``'metric.daily'`` and
    identifiers that merely contain the prefix substring (round-4 advice).
    """
    pat = re.compile(rf"(?<![\w.]){re.escape(qualifier)}(?=\w)")
    # split on single-quoted literals ('' escapes stay inside one token)
    parts = re.split(r"('(?:[^']|'')*')", select)
    return "".join(
        part if i % 2 else pat.sub("", part) for i, part in enumerate(parts)
    )
