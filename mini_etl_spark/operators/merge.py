"""Upsert / merge operators — the warehouse MERGE surface, Spark-first.

The reference's SQLLoader exposes ``if_exists='replace'|'append'``
(``mini_etl/components/loaders.py:197-276``) but has no keyed merge; real
ETL endpoints almost always need one. These operators implement the two
canonical shapes over plain DataFrames (no table-format dependency — the
result is a DataFrame you write with any sink):

- ``merge_upsert`` — SCD type 1: the delta wins, matched target rows are
  replaced, unmatched delta rows are inserted, optional delete predicate.
- ``scd2_apply``  — SCD type 2: matched-and-changed target rows are closed
  out (``valid_to`` stamped, ``is_current`` false) and a new current
  version is appended; history rows pass through untouched.

Scale notes (100 TB): the delta is almost always ≪ the target. Both
operators therefore join with the delta on the *build* side and hint it
``broadcast`` by default — the target (fact-sized) never shuffles: the
anti/left joins become BroadcastHashJoins and the union is a zero-exchange
concatenation. With ``broadcast_delta=False`` both sides shuffle-hash on
the keys, the right choice when the delta itself is fact-sized. Either
way the plan is two scans + one join + one union — no window, no global
sort, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "scd2_apply"]


def _key_list(keys: str | list[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def merge_upsert(
    target: DataFrame,
    delta: DataFrame,
    keys: str | list[str],
    delete_condition: str | None = None,
    broadcast_delta: bool = True,
) -> DataFrame:
    """SCD-1 merge: rows of ``delta`` replace same-keyed rows of ``target``;
    new keys are inserted; target rows matching ``delete_condition`` (a SQL
    predicate evaluated against delta-matched rows) are dropped.

    Equivalent SQL::

        SELECT * FROM delta WHERE NOT (<delete_condition>)
        UNION ALL
        SELECT t.* FROM target t WHERE NOT EXISTS
            (SELECT 1 FROM delta d WHERE d.k = t.k)

    Columns must be union-compatible by name (extra/missing columns raise —
    a keyed merge with schema drift is almost always a bug upstream).
    """
    keys = _key_list(keys)
    t_cols, d_cols = set(target.columns), set(delta.columns)
    if t_cols != d_cols:
        raise ValueError(
            "merge_upsert: target/delta schemas differ: "
            f"only-in-target={sorted(t_cols - d_cols)} "
            f"only-in-delta={sorted(d_cols - t_cols)}"
        )
    delta_keys = delta.select(*keys)
    if broadcast_delta:
        delta_keys = F.broadcast(delta_keys)
    kept_target = target.join(delta_keys, on=keys, how="left_anti")
    incoming = delta
    if delete_condition is not None:
        incoming = incoming.filter(~F.expr(delete_condition))
    return kept_target.unionByName(incoming.select(*target.columns))


def scd2_apply(
    target: DataFrame,
    delta: DataFrame,
    keys: str | list[str],
    compare_cols: list[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    broadcast_delta: bool = True,
) -> DataFrame:
    """SCD-2 merge: track history of ``compare_cols`` per key.

    ``target`` carries ``valid_from``/``valid_to``/``is_current`` columns;
    ``delta`` carries the natural columns plus ``effective_col`` (the change
    timestamp/date). For each delta row whose ``compare_cols`` differ from
    the key's *current* target row (or whose key is new):

    - the old current row (if any) is closed: ``valid_to`` = effective,
      ``is_current`` = false;
    - a new row is appended: ``valid_from`` = effective, ``valid_to`` =
      NULL, ``is_current`` = true.

    Unchanged-key delta rows are no-ops; historical target rows pass
    through untouched. One broadcast join against current rows + one
    union — the fact-sized history never shuffles.
    """
    keys = _key_list(keys)
    natural_cols = [c for c in target.columns if c not in (valid_from, valid_to, is_current)]
    missing = [c for c in natural_cols + [effective_col] if c not in delta.columns]
    if missing:
        raise ValueError(f"scd2_apply: delta is missing columns {missing}")

    current = target.filter(F.col(is_current))
    history = target.filter(~F.col(is_current))

    # Delta rows that actually change something (new key, or any compare
    # column differs from the key's current row). Null-safe comparison so
    # NULL→value and value→NULL both register as changes.
    #
    # Join-shape note: Spark can only broadcast the RIGHT side of outer /
    # semi / anti joins, so a naive ``delta LEFT JOIN current`` would force
    # the fact-sized current set through a shuffle. Instead: one INNER
    # BroadcastHashJoin (current streams, delta broadcast) yields the
    # matched pairs; new keys fall out of a small-vs-small anti join.
    d = delta.select(*natural_cols, effective_col)
    d_b = F.broadcast(d) if broadcast_delta else d
    cur_cmp = current.select(
        *keys, *[F.col(c).alias(f"__cur_{c}") for c in compare_cols]
    )
    matched = cur_cmp.join(d_b, on=keys, how="inner")  # ≤ |delta| rows
    changed_existing = matched.filter(
        ~F.expr(" AND ".join(f"({c} <=> __cur_{c})" for c in compare_cols))
    ).select(*natural_cols, effective_col)
    matched_keys = matched.select(*keys)
    new_keys = d.join(
        F.broadcast(matched_keys) if broadcast_delta else matched_keys,
        on=keys,
        how="left_anti",
    ).select(*natural_cols, effective_col)
    changed = changed_existing.unionByName(new_keys)

    changed_keys = changed.select(*keys)
    if broadcast_delta:
        changed_keys = F.broadcast(changed_keys)

    # Close out the superseded current rows; effective date comes from the
    # (broadcast) changed set — at most one delta row per key is assumed
    # (pre-aggregate the delta to latest-per-key upstream if not).
    eff_by_key = changed.select(*keys, F.col(effective_col).alias("__eff"))
    if broadcast_delta:
        eff_by_key = F.broadcast(eff_by_key)
    closed = (
        current.join(eff_by_key, on=keys, how="inner")
        .withColumn(valid_to, F.col("__eff"))
        .withColumn(is_current, F.lit(False))
        .drop("__eff")
    )
    untouched_current = current.join(changed_keys, on=keys, how="left_anti")

    new_versions = (
        changed.withColumn(valid_from, F.col(effective_col))
        .withColumn(valid_to, F.lit(None).cast(current.schema[valid_to].dataType))
        .withColumn(is_current, F.lit(True))
        .drop(effective_col)
    )

    out_cols = target.columns
    return (
        history.select(*out_cols)
        .unionByName(untouched_current.select(*out_cols))
        .unionByName(closed.select(*out_cols))
        .unionByName(new_versions.select(*out_cols))
    )
