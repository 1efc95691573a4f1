"""Declarative query recipes: a dict/YAML-shaped spec compiled to a
DataFrame plan.

The reference drives its heaviest pipeline (schema consolidation) from
per-dataset YAML configs — non-programmers describe WHAT to compute and
the engine decides HOW. This module gives the relational core the same
property: a recipe is data (checked into a dataset repo, diffable,
reviewable), the compiler emits an ordinary Catalyst plan, and every
engine guarantee (pushdown, broadcast dims, partial aggregation) applies
because the output IS a plain DataFrame expression tree — the compiler
adds no execution layer of its own.

Spec keys (all optional except ``table``):

    table:     source table name (resolved by the caller-provided loader)
    filter:    SQL boolean expression (pushed down by Catalyst)
    join:      list of {table, on, how='inner', broadcast=False, filter=None}
    derive:    {new_col: SQL expression} applied after joins
    group_by:  list of columns/expressions
    agg:       {out_col: SQL aggregate expression}   (requires group_by)
    order_by:  list of "col [DESC]" strings
    limit:     int

Expressions are Spark SQL strings evaluated with ``F.expr`` — the same
surface ``spark.sql`` exposes, so a recipe is portable to raw SQL and
its oracle is mechanical to derive.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_ALLOWED = {
    "table", "filter", "join", "derive", "group_by", "agg", "order_by", "limit",
}


class RecipeError(ValueError):
    pass


def compile_recipe(
    spec: dict, load: Callable[[str], DataFrame]
) -> DataFrame:
    """Compile a recipe spec into a DataFrame via ``load(table_name)``."""
    unknown = set(spec) - _ALLOWED
    if unknown:
        raise RecipeError(f"unknown recipe keys: {sorted(unknown)}")
    if "table" not in spec:
        raise RecipeError("recipe needs a 'table'")
    if "agg" in spec and "group_by" not in spec:
        raise RecipeError("'agg' requires 'group_by'")

    df = load(spec["table"])
    if "filter" in spec:
        df = df.where(F.expr(spec["filter"]))
    for j in spec.get("join", []):
        right = load(j["table"])
        if j.get("filter"):
            right = right.where(F.expr(j["filter"]))
        if j.get("broadcast"):
            right = F.broadcast(right)
        df = df.join(right, on=F.expr(j["on"]), how=j.get("how", "inner"))
    for col, expr in spec.get("derive", {}).items():
        df = df.withColumn(col, F.expr(expr))
    if "group_by" in spec:
        grouped = df.groupBy(*[F.expr(g) for g in spec["group_by"]])
        if "agg" in spec:
            df = grouped.agg(
                *[F.expr(e).alias(c) for c, e in spec["agg"].items()]
            )
        else:
            df = grouped.agg(F.count(F.lit(1)).alias("nb"))
    for key in ("order_by",):
        if key in spec:
            cols = []
            for o in spec[key]:
                parts = o.rsplit(" ", 1)
                if len(parts) == 2 and parts[1].upper() == "DESC":
                    cols.append(F.expr(parts[0]).desc())
                else:
                    cols.append(F.expr(o).asc())
            df = df.orderBy(*cols)
    if "limit" in spec:
        df = df.limit(int(spec["limit"]))
    return df
