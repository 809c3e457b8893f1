"""Global group-by aggregation.

Reference parity: GroupAggTransformer (transformers.py:326-378) was
*chunk-local*; StatefulAggTransformer (transformers.py:381-519) manually
re-implemented partial→merge→finalize aggregation to get global results.
In Spark both collapse into one declarative ``groupBy().agg()`` — Catalyst
plans exactly that partial/final HashAggregate around the shuffle, with
map-side combine for free (SURVEY §4.3.1). The reference's chunk-local mode
is an artifact and is intentionally not reproduced.

Output naming replicates the reference's MultiIndex flattening
(transformers.py:371-377): multi-function aggregation of column ``c`` with
function ``f`` produces ``c_f``; a single function keeps the rule too, so
column names are stable for golden tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]

# Reference agg vocabulary (pandas groupby fn names) → Spark functions.
_AGG_FNS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "count": F.count,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "first": F.first,
    "last": F.last,
    "nunique": F.countDistinct,
    "approx_nunique": F.approx_count_distinct,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "median": F.median,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
}


def group_agg(
    group_by: str | list[str] | None,
    agg: dict[str, str | list[str]],
) -> Transform:
    """Global hash aggregation: ``group_agg("k", {"v": ["sum", "mean"]})``
    yields columns ``k, v_sum, v_mean``.

    ``group_by=None`` (or ``[]``) aggregates the whole table to one row —
    the reference's global StatefulAgg with no keys (transformers.py:416-418).

    Scale notes: this is the canonical shuffle-on-keys operator. Partial
    aggregation happens map-side automatically; low-cardinality keys produce
    tiny shuffles, skewed keys are split by AQE (enabled in the session
    factory). Never collect — the result is itself a DataFrame.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    spec: list[tuple[str, str]] = []
    for col, fns in agg.items():
        fn_list = [fns] if isinstance(fns, str) else list(fns)
        for fn in fn_list:
            key = str(fn).lower()
            if key not in _AGG_FNS:
                raise ValueError(
                    f"group_agg: unsupported aggregate {fn!r} "
                    f"(supported: {sorted(_AGG_FNS)})"
                )
            spec.append((col, key))
    if not spec:
        raise ValueError("group_agg: empty agg spec")

    def _apply(df: DataFrame) -> DataFrame:
        # Column construction deferred: F.* needs an active SparkContext,
        # and factories must be buildable before the session exists.
        exprs = [_AGG_FNS[fn](col).alias(f"{col}_{fn}") for col, fn in spec]
        if keys:
            return df.groupBy(*keys).agg(*exprs)
        return df.agg(*exprs)

    return _apply
