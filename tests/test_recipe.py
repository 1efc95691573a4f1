"""Declarative recipe compiler (plans/recipe.py): validation, plan
quality of compiled output, and oracle parity through the catalog."""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark.plans.recipe import (
    RecipeError,
    compile_recipe,
)


def _loader(spark, sf_dir):
    from datagouvfr_data_pipelines_spark.plans.catalog import table

    return lambda t: table(spark, sf_dir, t)


def test_recipe_validation_errors(spark, sf_dir):
    load = _loader(spark, sf_dir)
    with pytest.raises(RecipeError, match="unknown recipe keys"):
        compile_recipe({"table": "orders", "boom": 1}, load)
    with pytest.raises(RecipeError, match="needs a 'table'"):
        compile_recipe({"filter": "1=1"}, load)
    with pytest.raises(RecipeError, match="requires 'group_by'"):
        compile_recipe({"table": "orders", "agg": {"n": "count(1)"}}, load)


def test_recipe_compiles_to_quality_plan(spark, sf_dir):
    from datagouvfr_data_pipelines_spark.plans.relational14 import (
        SEGMENT_RECIPE,
    )
    from tests.test_plan_quality import plan_of

    df = compile_recipe(SEGMENT_RECIPE, _loader(spark, sf_dir))
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan     # broadcast hint honored
    assert "PushedFilters" in plan         # filter reached the scan
    assert plan.count("HashAggregate") >= 2  # partial aggregation
    assert df.columns == ["c_mktsegment", "order_year", "nb_orders", "total"]


def test_recipe_group_by_without_agg_counts(spark, sf_dir):
    df = compile_recipe(
        {"table": "region", "group_by": ["r_name"]}, _loader(spark, sf_dir)
    )
    rows = df.collect()
    assert len(rows) == 5 and all(r["nb"] == 1 for r in rows)
