"""SQL front door (plans/sqlviews.py): DDL-script porting, pyramid
execution, and plan parity between the SQL-text form and the DataFrame-API
form of the same view."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.plans.sqlviews import (
    parse_view_script,
    run_sql_views,
)


def test_parse_view_script_strips_schema_and_keeps_order():
    script = """
    -- daily merge
    CREATE MATERIALIZED VIEW IF NOT EXISTS metric.daily AS
        SELECT d, SUM(n) AS n FROM metric.raw GROUP BY d;

    CREATE MATERIALIZED VIEW metric.monthly AS
        SELECT substr(d, 1, 7) AS m, SUM(n) AS n FROM metric.daily GROUP BY 1;
    """
    views = parse_view_script(script, strip_schemas=("metric.",))
    assert list(views) == ["daily", "monthly"]
    assert "FROM raw" in views["daily"] and "metric." not in views["monthly"]
    assert "--" not in views["daily"]


def test_parse_view_script_qualifier_strip_is_quote_and_boundary_aware():
    """Round-4 advice: stripping must not touch string literals or
    identifiers that merely CONTAIN the prefix substring."""
    script = (
        "CREATE MATERIALIZED VIEW metric.daily AS\n"
        "  SELECT kind, biometric.score AS s\n"
        "  FROM metric.raw JOIN biometric ON biometric.id = metric.raw.id\n"
        "  WHERE kind = 'metric.daily' AND note = 'metric. in prose';\n"
    )
    views = parse_view_script(script, strip_schemas=("metric.",))
    sel = views["daily"]
    # real qualifiers stripped
    assert "FROM raw JOIN" in sel and "= raw.id" in sel
    # identifier containing the substring untouched (boundary-aware)
    assert "biometric.score" in sel and "biometric.id" in sel
    # string literals untouched (quote-aware)
    assert "'metric.daily'" in sel and "'metric. in prose'" in sel


def test_run_sql_views_pyramid_and_ddl_port(spark):
    base = spark.createDataFrame(
        [("2024-01-01", 5), ("2024-01-15", 3), ("2024-02-03", 7)],
        "d string, n int",
    )
    script = """
    CREATE MATERIALIZED VIEW IF NOT EXISTS metric.daily AS
        SELECT d, SUM(n) AS n FROM metric.raw GROUP BY d;
    CREATE MATERIALIZED VIEW IF NOT EXISTS metric.monthly AS
        SELECT substr(d, 1, 7) AS m, SUM(n) AS n FROM metric.daily GROUP BY substr(d, 1, 7);
    """
    out = run_sql_views(
        spark, parse_view_script(script, strip_schemas=("metric.",)),
        base={"raw": base},
    )
    got = {r["m"]: r["n"] for r in out["monthly"].collect()}
    assert got == {"2024-01": 8, "2024-02": 7}


def test_sql_pyramid_matches_dataframe_form(spark, sf_dir):
    """The SQL-text J4 view and the DataFrame-API form must return the same
    rows AND plan the same physical join (both reduce to a full-outer
    SortMergeJoin over the two aggregates — spark.sql adds no layer)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()

    sql_monthly = qs["sql_metrics_pyramid"](spark, sf_dir)
    df_daily = qs["j4_full_outer_daily"](spark, sf_dir)
    df_monthly = (
        df_daily.groupBy(F.date_format("d", "yyyy-MM").alias("metric_month"))
        .agg(
            F.sum("nb_orders").alias("monthly_orders"),
            F.sum("nb_events").alias("monthly_events"),
        )
    )
    got = {r["metric_month"]: (r["monthly_orders"], r["monthly_events"])
           for r in sql_monthly.collect()}
    want = {r["metric_month"]: (r["monthly_orders"], r["monthly_events"])
            for r in df_monthly.collect()}
    assert got == want
    # same physical join strategy for the J4 level
    sql_plan = spark.sql(
        "SELECT * FROM mv_metrics_daily"
    )._jdf.queryExecution().executedPlan().toString()
    df_plan = df_daily._jdf.queryExecution().executedPlan().toString()
    for marker in ("SortMergeJoin", "FullOuter"):
        assert marker in sql_plan, marker
        assert marker in df_plan, marker
