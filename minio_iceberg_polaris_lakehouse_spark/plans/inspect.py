"""Physical-plan inspection: the engine's scale guarantees (pushdown,
pruning, broadcast vs shuffle, codegen, no accidental cartesian products)
asserted as code instead of hoped for. tests/test_plans.py pins them.

The reference gets these properties from Catalyst implicitly (SURVEY.md
§4); this module makes them observable so a regression (e.g. a filter
that stops pushing down) fails CI instead of melting a 1000-executor job.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The executed/physical plan as text (what .explain(mode) prints).

    Classic sessions go straight to the JVM; a Spark Connect DataFrame
    has no _jdf/_sc, so fall back to capturing df.explain(mode) — same
    text, works on both stacks."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode
        )
    except AttributeError:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (DataSource PushedFilters)."""
    plan = plan_string(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — column pruning evidence."""
    return re.findall(r"ReadSchema: ([^\n]*)", plan_string(df))


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical operator in the plan tree. Tree lines read
    'NodeName <args> (7)'; the details section repeats nodes as
    '(7) NodeName' — only tree lines match this pattern."""
    return len(re.findall(rf"\b{re.escape(node)}\b[^\n]*\(\d+\)", plan_string(df)))


def scan_count(df: DataFrame) -> int:
    return count_nodes(df, "Scan parquet")


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of whole-stage-codegen spans (wider is better — fewer
    interpreter boundaries). Under AQE the final plan (with its codegen
    ids) only exists after execution, so trigger it by default."""
    if execute:
        # collect() runs THIS DataFrame's QueryExecution (count() would
        # build a different plan and leave this one un-finalized under AQE)
        df.collect()
    return len(set(re.findall(r"\[codegen id : (\d+)\]", plan_string(df, "formatted"))))


def assert_no_cartesian(df: DataFrame) -> None:
    plan = plan_string(df)
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains CartesianProduct:\n" + plan)


def shuffle_count(df: DataFrame) -> int:
    """Exchange nodes in the plan — each is a full shuffle of its input."""
    return count_nodes(df, "Exchange")
