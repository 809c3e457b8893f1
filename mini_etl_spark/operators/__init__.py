"""Transform factories: each returns a ``DataFrame -> DataFrame`` closure.

This is the engine's analogue of the reference's ``Transformer`` classes
(``mini_etl/components/transformers.py``), but instead of mutating pandas
chunks, each factory *declares* a lazy DataFrame transformation that Catalyst
can optimize (pushdown, pruning, partial aggregation, join selection).

Semantics deltas vs the reference are deliberate (SURVEY.md §4.3): group_agg,
dedup and sort are **global**, not chunk-local; order-dependent operations
(ffill/bfill, dedup keep-first/last) require an explicit ``order_by``.
"""

from mini_etl_spark.operators.core import (
    apply_by_group,
    cast_types,
    drop_columns,
    fill_na,
    filter_rows,
    explode_column,
    limit,
    map_batches,
    rename_columns,
    select_columns,
    with_expression,
)
from mini_etl_spark.operators.agg import group_agg
from mini_etl_spark.operators.dedup import deduplicate
from mini_etl_spark.operators.sort import sort_rows
from mini_etl_spark.operators.joins import asof_join, join, range_join
from mini_etl_spark.operators.merge import merge_upsert, scd2_apply, scd2_snapshot
from mini_etl_spark.operators.validate import (
    quarantine_stats,
    split_valid,
    validate_rows,
)

__all__ = [
    "apply_by_group",
    "filter_rows",
    "rename_columns",
    "select_columns",
    "drop_columns",
    "cast_types",
    "fill_na",
    "with_expression",
    "group_agg",
    "deduplicate",
    "sort_rows",
    "map_batches",
    "limit",
    "explode_column",
    "join",
    "asof_join",
    "range_join",
    "merge_upsert",
    "scd2_apply",
    "scd2_snapshot",
    "validate_rows",
    "split_valid",
    "quarantine_stats",
]
