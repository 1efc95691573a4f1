"""Physical-plan linter: the anti-pattern checks `tests/test_plan_quality.py`
pins for the catalog, packaged so ANY pipeline can assert them pre-flight
(`lint_plan(df)` in a test, or `assert_plan_clean(df)` as a deploy gate).

Each rule is a scale rule, not a style rule: a flagged plan may be correct
at sf0.1 and still fall over at 100x — which is exactly when you no longer
want to discover it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    m = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(m)


def lint_plan(df: DataFrame, expect_pushdown_on: list[str] | None = None) -> list[str]:
    """Return human-readable warnings for scale anti-patterns in the
    OPTIMIZED physical plan. Empty list = clean.

    Rules:
    - cartesian: CartesianProduct / BroadcastNestedLoopJoin — all-pairs work;
      only acceptable on provably tiny broadcast sides.
    - python-udf: row-at-a-time BatchEvalPython — breaks codegen, serializes
      per row; use built-ins or Arrow-batched pandas UDFs.
    - global-sort-window: a Window with an empty partition spec funnels every
      row through one task.
    - no-partial-agg: a shuffle-then-single-HashAggregate shape ships raw
      rows instead of map-side combining (requires a groupBy in the plan).
    - missing-pushdown: caller-named columns absent from PushedFilters on
      the scan.
    """
    plan = _explain(df)
    warnings: list[str] = []

    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        warnings.append(
            "cartesian: CartesianProduct/BroadcastNestedLoopJoin in plan — "
            "all-pairs join; bound one side or add an equi-key"
        )
    if "BatchEvalPython" in plan:
        warnings.append(
            "python-udf: row-at-a-time Python UDF (BatchEvalPython) — use "
            "built-in functions or an Arrow-batched pandas UDF"
        )
    if "Window" in plan:
        # formatted mode elides window specs; read them from simple mode
        simple = _explain(df, "simple")
        for line in simple.splitlines():
            ls = line.strip()
            if "Window [" in ls and "windowspecdefinition(" in ls:
                if not _has_partition_spec(ls):
                    warnings.append(
                        "global-sort-window: Window without PARTITION BY — "
                        "single-task bottleneck; use the distributed "
                        "prefix-sum pattern (operators/assembly.py)"
                    )
                    break
    if "HashAggregate" in plan:
        n_agg = plan.count("HashAggregate")
        n_obj = plan.count("ObjectHashAggregate") + plan.count("SortAggregate")
        if n_agg == 1 and n_obj == 0 and "Exchange" in plan:
            warnings.append(
                "no-partial-agg: single HashAggregate above an Exchange — "
                "raw rows cross the shuffle; check for distinct-style "
                "aggregates blocking map-side combine"
            )
    for col in expect_pushdown_on or []:
        pushed = ""
        if "PushedFilters: [" in plan:
            pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        # IsNotNull is pushed even when the real predicate can't be — it
        # doesn't count as "the filter reached the scan"
        real = [
            f for f in pushed.split(", ")
            if f and not f.startswith("IsNotNull(")
        ]
        if not any(col in f for f in real):
            warnings.append(
                f"missing-pushdown: filter on '{col}' did not reach the scan "
                "(PushedFilters) — check for casts/UDFs wrapping the column"
            )
    return warnings


def _has_partition_spec(window_line: str) -> bool:
    """A windowspecdefinition's argument list starts with the partition
    columns; 'windowspecdefinition(x#1 ASC...' (ordering first) means the
    partition spec is empty."""
    inner = window_line.split("windowspecdefinition(", 1)[1]
    head = inner.split(",", 1)[0]
    return " ASC" not in head and " DESC" not in head


def assert_plan_clean(df: DataFrame, **kwargs) -> DataFrame:
    """Deploy-gate form: raise on any lint warning, pass the frame through."""
    problems = lint_plan(df, **kwargs)
    if problems:
        raise AssertionError("plan lint failed:\n- " + "\n- ".join(problems))
    return df
