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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "scd2_apply", "scd2_snapshot", "snapshot_diff"]


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
    new keys are inserted; delta rows matching ``delete_condition`` whose key
    exists in ``target`` are dropped (warehouse ``WHEN MATCHED AND <cond>
    THEN DELETE`` — the predicate never suppresses not-matched inserts).

    Equivalent SQL::

        SELECT d.* FROM delta d
        WHERE NOT (<delete_condition>
                   AND EXISTS (SELECT 1 FROM target t WHERE t.k = d.k))
        UNION ALL
        SELECT t.* FROM target t WHERE NOT EXISTS
            (SELECT 1 FROM delta d WHERE d.k = t.k)

    Columns must be union-compatible by name (extra/missing columns raise —
    a keyed merge with schema drift is almost always a bug upstream).

    With ``delete_condition`` set, the matched-key set is computed with one
    extra pass over ``target``'s key columns (a column-pruned scan + one
    BroadcastHashJoin when ``broadcast_delta``) — the only way to know which
    delta keys are matched without shuffling the fact-sized target.
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
        # WHEN MATCHED AND cond THEN DELETE: only matched delta rows are
        # eligible; new-key rows are inserted regardless of the predicate.
        matched_keys = target.select(*keys).join(
            delta_keys, on=keys, how="left_semi"
        ).distinct()
        if broadcast_delta:
            matched_keys = F.broadcast(matched_keys)
        matched_delta = delta.join(matched_keys, on=keys, how="left_semi")
        unmatched_delta = delta.join(matched_keys, on=keys, how="left_anti")
        incoming = matched_delta.filter(~F.expr(delete_condition)).unionByName(
            unmatched_delta
        )
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
    dedupe_delta: bool = True,
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

    Assumptions (enforced / guarded):

    - **One delta row per key.** With ``dedupe_delta=True`` (default) the
      delta is pre-aggregated to the latest row per key (``max_by`` on the
      effective column — one hash-aggregate over the broadcast-sized delta)
      so duplicate delta keys cannot mint multiple ``is_current`` versions.
      Set ``dedupe_delta=False`` only when the delta is already unique.
    - **Monotonic effective dates.** The effective timestamp must be ≥ the
      current row's ``valid_from`` — an out-of-order delta (back-dated
      change) would produce an inverted interval. The operator raises at
      execution time (``assert_true`` on the closed rows, checked only on
      the ≤ |delta| rows being closed) instead of silently corrupting the
      dimension; apply back-dated corrections by rebuilding the affected
      keys' history upstream.
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
    if dedupe_delta:
        payload = [c for c in natural_cols if c not in keys] + [effective_col]
        d = (
            d.groupBy(*keys)
            .agg(
                F.max_by(F.struct(*payload), F.col(effective_col)).alias("__row")
            )
            .select(*keys, "__row.*")
            .select(*natural_cols, effective_col)
        )
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
    # (broadcast) changed set — one row per key, guaranteed by dedupe_delta
    # (or by the caller when dedupe_delta=False).
    eff_by_key = changed.select(*keys, F.col(effective_col).alias("__eff"))
    if broadcast_delta:
        eff_by_key = F.broadcast(eff_by_key)
    # assert_true returns NULL on success, so the filter keeps every row —
    # but, unlike a dropped column, it cannot be pruned away by Catalyst.
    ooo_guard = F.assert_true(
        F.col("__eff") >= F.col(valid_from),
        F.concat(
            F.lit("scd2_apply: out-of-order delta — effective "),
            F.col("__eff").cast("string"),
            F.lit(f" < {valid_from} "),
            F.col(valid_from).cast("string"),
            F.lit(" for key "),
            F.concat_ws("/", *[F.col(k).cast("string") for k in keys]),
        ),
    )
    closed = (
        current.join(eff_by_key, on=keys, how="inner")
        .filter(ooo_guard.isNull())
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


def scd2_snapshot(
    df: DataFrame,
    as_of,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    drop_validity: bool = False,
) -> DataFrame:
    """Point-in-time view of an SCD-2 dimension (the read-side twin of
    :func:`scd2_apply`): the one version of each key whose validity
    interval covers ``as_of`` — ``valid_from <= as_of`` and
    (``valid_to`` IS NULL or ``valid_to > as_of``). Keys first effective
    after ``as_of`` vanish, exactly as the dimension looked then.

    Interval convention matches ``scd2_apply``: ``valid_from`` inclusive,
    ``valid_to`` exclusive (a row closed at T is superseded by the row
    effective at T). ``as_of`` may be a Python date/datetime, an ISO
    string, or a Column.

    Scale: a pure filter — pushed into the parquet scan, prunes
    partitions when the dimension is partitioned on the validity dates,
    no shuffle, no window. ``drop_validity=True`` removes the three
    bookkeeping columns for a business-facing view.
    """
    as_of_col = as_of if isinstance(as_of, Column) else F.lit(as_of)
    out = df.filter(
        (F.col(valid_from) <= as_of_col)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > as_of_col))
    )
    if drop_validity:
        out = out.drop(valid_from, valid_to, is_current)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    compare_columns: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots of the same keyed table:
    one row per changed key, labeled ``change_type`` =
    ``'insert'`` (key only in ``new``), ``'delete'`` (key only in
    ``old``), or ``'update'`` (key in both, any compared column differing
    null-safely). Inserts and updates carry the NEW side's values,
    deletes the OLD side's — exactly what a downstream ``merge_upsert``
    or audit log wants. Unchanged keys are dropped.

    ``compare_columns`` restricts which non-key columns define an update
    (default: every shared non-key column). Both frames must share the
    key columns; value columns are taken from the shared set. Key
    columns must be non-null (the presence test reads a null key as
    "absent", the universal CDC convention).

    Scale: ONE full-outer shuffle join on the keys — both sides hash-
    partition once, the null-safe comparison is a codegen projection, and
    no window/sort/driver collection exists. At 100 TB snapshot-diffing
    is join-bound by design; with both snapshots bucketed on the keys
    (``to_parquet_bucketed``) the exchange disappears entirely.
    """
    key_cols = _key_list(keys)
    shared = [
        c for c in new.columns if c in set(old.columns) and c not in key_cols
    ]
    cmp_cols = compare_columns if compare_columns is not None else shared
    missing = [c for c in cmp_cols if c not in shared]
    if missing:
        raise ValueError(f"snapshot_diff: compare columns not shared: {missing}")

    o = old.select(*key_cols, *shared).alias("o")
    n = new.select(*key_cols, *shared).alias("n")
    cond = None
    for kc in key_cols:
        e = F.col(f"o.{kc}").eqNullSafe(F.col(f"n.{kc}"))
        cond = e if cond is None else cond & e
    joined = o.join(n, cond, "full_outer")

    o_key = F.col(f"o.{key_cols[0]}")
    n_key = F.col(f"n.{key_cols[0]}")
    changed = F.lit(False)
    for c in cmp_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change_type = (
        F.when(o_key.isNull(), F.lit("insert"))
        .when(n_key.isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    picked = [
        F.coalesce(F.col(f"n.{kc}"), F.col(f"o.{kc}")).alias(kc)
        for kc in key_cols
    ] + [
        F.when(n_key.isNull(), F.col(f"o.{c}"))
        .otherwise(F.col(f"n.{c}"))
        .alias(c)
        for c in shared
    ]
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select("change_type", *picked)
    )
