"""Physical-plan inspection utilities.

The engine's scale guarantees are *plan properties*: filters reach the
parquet scan (PushedFilters), projections prune the read schema, small
dimension joins broadcast, hot expressions stay inside WholeStageCodegen.
These helpers turn those properties into assertions — used by the test
suite (tests/test_plans.py) and available to users for their own pipelines
(`explain_summary(df)` for a one-line audit).

This replaces nothing in the reference (it has no plans to inspect —
SURVEY §4.1); it is how this engine keeps itself honest about Catalyst
actually applying the optimizations the reference did by hand.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanSummary:
    pushed_filters: list[str]
    read_schemas: list[str]
    joins: list[str]
    has_broadcast_join: bool
    has_sort_merge_join: bool
    exchanges: int
    codegen_stages: int
    aqe: bool

    def __str__(self) -> str:  # human-oriented one-screen audit
        return (
            f"pushed_filters={self.pushed_filters}\n"
            f"read_schemas={self.read_schemas}\n"
            f"joins={self.joins}\n"
            f"exchanges={self.exchanges} codegen_stages={self.codegen_stages} "
            f"aqe={self.aqe}"
        )


def summarize(df: DataFrame) -> PlanSummary:
    plan = physical_plan(df, "formatted")
    # codegen stage markers only appear in simple mode in Spark 4 ("*(N) Op")
    simple = physical_plan(df, "simple")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    joins = re.findall(r"(\w*(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)\w*)", plan)
    return PlanSummary(
        pushed_filters=[p for p in pushed if p.strip()],
        read_schemas=schemas,
        joins=sorted(set(joins)),
        has_broadcast_join="BroadcastHashJoin" in plan,
        has_sort_merge_join="SortMergeJoin" in plan,
        exchanges=len(re.findall(r"\bExchange\b|\bShuffleExchange", plan)),
        codegen_stages=len(set(re.findall(r"\*\((\d+)\)", simple))),
        aqe="AdaptiveSparkPlan" in plan,
    )


def executed_codegen_stages(df: DataFrame) -> int:
    """Number of WholeStageCodegen stages in the FINAL (post-AQE) plan.

    Runs ``collect()``: AQE finalizes (and annotates codegen) only after an
    action runs on *this exact* Dataset — a write spawns a separate
    execution and would leave this one un-finalized. Diagnostic use on
    small/aggregated frames only; don't call on a huge result."""
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    return len(set(re.findall(r"\*\((\d+)\)", final)))


def explain_summary(df: DataFrame) -> str:
    """One-line-per-property audit of a DataFrame's physical plan."""
    return str(summarize(df))


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert some predicate containing ``fragment`` reached the scan."""
    s = summarize(df)
    if not any(fragment in p for p in s.pushed_filters):
        raise AssertionError(
            f"no pushed filter contains {fragment!r}; pushed={s.pushed_filters}"
        )


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Assert every scan in the plan reads no columns beyond ``columns``
    (column pruning happened)."""
    s = summarize(df)
    for schema in s.read_schemas:
        read_cols = set(re.findall(r"(\w+):", schema))
        extra = read_cols - columns
        if extra:
            raise AssertionError(
                f"scan reads unpruned columns {sorted(extra)} (schema {schema})"
            )


def assert_broadcast_join(df: DataFrame) -> None:
    s = summarize(df)
    if not s.has_broadcast_join:
        raise AssertionError(f"expected a BroadcastHashJoin; joins={s.joins}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df, "formatted")
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains a CartesianProduct")
