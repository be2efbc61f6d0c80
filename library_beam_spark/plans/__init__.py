"""Physical-plan introspection & assertions.

"The first plan that passes" is not the bar — these helpers let tests
pin the plan PROPERTIES that matter at 100 TB: filters/projections
reaching the parquet scan, small dims broadcast, aggregates partial
map-side, no Python round-trip in relational paths, whole-stage codegen
spans present (SURVEY §4).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) plan string: run the query, then read the plan."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning check)."""
    m = re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
    cols: list[str] = []
    for schema in m:
        cols.extend(part.split(":")[0] for part in schema.split(",") if part)
    return cols


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters line(s) of every scan in the plan."""
    return "\n".join(re.findall(r"PushedFilters: \[[^\]]*\]", formatted_plan(df)))


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    assert column in pf, f"filter on {column} not pushed to scan; got: {pf}"


def assert_columns_pruned(df: DataFrame, max_columns: int) -> None:
    cols = read_schema_columns(df)
    assert len(cols) <= max_columns, f"scan reads {len(cols)} cols: {cols}"


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= expect, f"expected >= {expect} broadcast joins:\n{plan[:2000]}"


def assert_partial_aggregation(df: DataFrame) -> None:
    """Map-side partial agg present (HashAggregate/SortAggregate pairs or
    explicit partial_ functions)."""
    plan = formatted_plan(df)
    assert "partial_" in plan, f"no partial aggregation in plan:\n{plan[:2000]}"


def assert_no_python_eval(df: DataFrame) -> None:
    """Relational operators must not fall back to Python row processing
    (BatchEvalPython = row-at-a-time UDF; ArrowEvalPython/MapInPandas are
    the sanctioned kernel nodes but not allowed where we claim
    built-ins-only)."""
    plan = formatted_plan(df)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"{node} found in supposedly JVM-only plan"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    # formatted mode marks codegen'd operators with "[codegen id : N]";
    # simple mode would show WholeStageCodegen nodes. AQE plans hide the
    # markers until execution, so fall back to the simple string.
    plan = formatted_plan(df)
    simple = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "codegen id" in plan or "WholeStageCodegen" in simple, (
        "no codegen span in plan"
    )
