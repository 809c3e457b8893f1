"""Row-level data-quality validation with quarantine semantics.

The reference validates schemas up front and offers row-level *error
handling* modes (``mini_etl/core/pipeline.py`` raise/skip/log, mirrored in
``mini_etl_spark/pipeline.py``) and this engine already has the
aggregate-pass expectation report (``schema.check_expectations``). What
neither covers is the standard warehouse pattern in between: evaluate a
set of named boolean rules against EVERY row, label each row with the
rules it violates, and route clean rows forward while quarantining the
rest for inspection — without ever failing the job.

Scale notes (100 TB): rule evaluation is one codegen projection (every
rule is a Catalyst boolean expression — no UDFs, no shuffle, no action).
``split_valid`` returns two lazy filters over the SAME labeled frame; when
both branches are consumed the caller should ``persist()`` the labeled
frame (or write it once and read twice) so the rules are not evaluated
twice — exactly the fan-out contract ``PipelineDAG`` applies to branch
nodes. Violation labels are a tiny ``array<string>`` per row; quarantined
output carries full rows so reprocessing needs no join back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_rows", "split_valid", "quarantine_stats"]


def _violation_array(rules: dict[str, str]) -> Column:
    """array<string> of failed rule names, in rule-declaration order.

    NULL-safety: a rule *passes* only when its expression evaluates to
    TRUE; NULL (e.g. ``amount > 0`` over a NULL amount) counts as a
    violation — the conservative reading every expectations framework
    uses, and the one that makes ``IS NOT NULL`` rules unnecessary to
    state twice.
    """
    if not rules:
        raise ValueError("validate_rows: rules must be a non-empty dict")
    return F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(False)),
                    F.lit(name),
                )
                for name, expr in rules.items()
            ]
        )
    )


def validate_rows(
    df: DataFrame,
    rules: dict[str, str],
    violations_col: str = "violations",
) -> DataFrame:
    """Label every row with the names of the rules it violates.

    ``rules`` maps rule name -> SQL boolean expression (evaluated with
    ``F.expr``, so any Catalyst expression over the row's columns works).
    Adds ``violations_col`` (``array<string>``, empty = clean row). Pure
    projection: no shuffle, no action, fully codegen'd.
    """
    return df.withColumn(violations_col, _violation_array(rules))


def split_valid(
    df: DataFrame,
    rules: dict[str, str],
    violations_col: str = "violations",
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine) pair from one rule evaluation.

    ``valid`` is the clean rows with the label column dropped (schema
    unchanged — safe to feed the rest of the pipeline); ``quarantine`` is
    the violating rows WITH the ``violations_col`` label, ready to write
    to a quarantine sink. Both are lazy filters over the same labeled
    plan — persist it (or route through ``PipelineDAG``, which persists
    fan-outs automatically) when consuming both.
    """
    labeled = validate_rows(df, rules, violations_col)
    valid = labeled.filter(F.size(violations_col) == 0).drop(violations_col)
    quarantine = labeled.filter(F.size(violations_col) > 0)
    return valid, quarantine


def quarantine_stats(
    df: DataFrame,
    rules: dict[str, str],
) -> DataFrame:
    """Per-rule violation counts in ONE aggregate pass over the data:
    (``rule``, ``violation_count``, ``row_count``) — the monitoring feed
    for a quarantine pipeline. Implemented as conditional-count aggregates
    (map-side combined; the exchange carries one row), not N filters.
    Rows with no violations contribute to ``row_count`` only.
    """
    aggs = [
        F.count_if(F.array_contains("__viol", name)).alias(f"__c_{i}")
        for i, name in enumerate(rules)
    ] + [F.count(F.lit(1)).alias("__n")]
    row = validate_rows(df, rules, "__viol").agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"__c_{i}").alias("violation_count"),
                )
                for i, name in enumerate(rules)
            ]
        )
    )
    return row.select(pairs.alias("__p"), F.col("__n").alias("row_count")).select(
        "__p.rule", "__p.violation_count", "row_count"
    )
