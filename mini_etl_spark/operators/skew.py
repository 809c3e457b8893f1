"""Skew mitigation: salted joins and explicit key-spreading.

AQE's skew-join splitting (on in the session defaults) handles most skew at
runtime by splitting oversized partitions. Salting is the *planned* variant
for the pathological case AQE can't fix: one logical key so hot that even a
split partition's build side won't fit — the classic power-law join
(user_id with one bot user owning 10% of a 100 TB fact table).

``salted_join``: the fact side gets a uniform random salt in [0, salt);
the dimension side is exploded ×salt so every (key, salt) bucket finds its
match. Equi-join on (key, salt) spreads the hot key over ``salt`` reducers.
Cost: dimension side replicated ×salt — use for large-fact ⋈ small-dim
joins (where the dim would broadcast anyway if it weren't for the giant
fact partitions) or large-large joins with a known hot-key list.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def key_skew_stats(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 20,
) -> DataFrame:
    """Skew diagnostic: the ``top_n`` heaviest key values with their row
    counts and share of the table — the number you need BEFORE choosing a
    join strategy at scale (a key holding >1% of a 100 TB fact table wants
    a salted join or an AQE skew split; this query tells you which keys).

    Output: key columns, ``key_count`` (rows for that key), ``key_share``
    (fraction of all rows, 6 decimals), ordered heaviest-first with the
    key as tiebreak.

    Scale: one partial+final hash aggregate over the keys, the 1-row
    total broadcast into the stream side (the scalar-subquery shape: one
    comparison-free probe per row), and a TakeOrderedAndProject for the
    top-n — no global sort, no driver collect.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("key_count"))
    total = counts.agg(F.sum("key_count").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "key_count",
            F.round(F.col("key_count") / F.col("__total"), 6).alias(
                "key_share"
            ),
        )
        .orderBy(F.col("key_count").desc(), *keys)
        .limit(top_n)
    )


def parse_freq_budget(cap: str) -> int:
    """The numeric candidate-volume budget inside an ``"auto:<budget>"``
    cap string (scientific notation accepted, e.g. ``"auto:1e9"``).
    THE one parser for the budget grammar — config-time validation
    (config._parse_freq_cap) and runtime resolution
    (functions.dedup._resolve_freq_cap) both call it, so the accepted
    form can never drift between the two. A non-positive budget raises
    here (config-load time), not at runtime: ``auto:0`` would otherwise
    silently degenerate to the floor-only cap with nothing but a log
    warning — a misconfiguration, not a tuning choice."""
    try:
        budget = int(float(cap.split(":", 1)[1]))
    except ValueError:
        raise ValueError(
            f"frequency cap budget must be numeric "
            f"('auto:<candidate-volume>'), got {cap!r}"
        ) from None
    if budget <= 0:
        raise ValueError(
            f"frequency cap budget must be positive "
            f"('auto:<candidate-volume>'), got {cap!r}"
        )
    return budget


def auto_frequency_cap(
    freq: DataFrame,
    count_col: str = "__f",
    quantile: float = 0.999,
    multiplier: float = 4.0,
    floor: int = 64,
    max_candidate_volume: int | None = None,
) -> int:
    """Derive a hot-key frequency cap from the OBSERVED distribution:
    ``cap = max(floor, ceil(multiplier · approx-quantile(count,
    quantile)))`` over a (key, count) frame.

    This is what turns the pair-join guards (stop-shingles, hot tokens,
    hot spans — the ``max_*_freq`` parameters in ``functions.dedup``)
    from hand-tuned constants into corpus-adaptive ones: the cap sits a
    ``multiplier`` above the tail of the real distribution, so ordinary
    keys (≤ the 99.9th-percentile document frequency) always survive and
    only the boilerplate spike — the part that contributes O(freq²)
    join pairs and ~no discriminative signal — is cut, whatever the
    corpus' skew profile. A corpus with no spike gets a cap nothing
    reaches (no behavior change); pass the ``floor`` up for tiny corpora
    where the quantile itself is single-digits.

    ``max_candidate_volume`` adds a WORK BUDGET on top of the quantile
    rule: an inverted-index pair join's cost is the candidate volume
    ``Σ count²`` over the keys that survive the cap, and a distribution
    with many keys just under a frequency cap can pay
    ``survivors × cap²`` even though no single key is hot (measured at
    20× replica scale: time tracks post-cap ``Σ count²`` to within 1% —
    SCALE.md round-7 second pass). When set, the cap is lowered to the
    largest value whose surviving candidate volume fits the budget, so
    the join's total work is bounded whatever the corpus' shape — with
    ONE exception: the ``floor`` still wins below it, so on a corpus
    whose floor-level volume already exceeds the budget the post-cap
    ``Σ count²`` CAN exceed ``max_candidate_volume`` (a warning is
    logged when that happens). The floor keeps the operator usable on
    tiny corpora; pass ``floor=1`` to make the budget binding alone.

    Recall trade, stated honestly (same as SCALE.md's 20× adjudication):
    when the budget BINDS below the quantile cap, pairs mediated ONLY by
    keys above the lowered cap are sacrificed — the same trade every
    frequency cap makes, now with a work bound attached. An INFO line is
    logged at fit time (derived cap, admitted volume, budget) so the
    trade is visible in production logs, not only in offline artifacts.

    Cost: one ``percentile_approx`` aggregate over the vocabulary-sized
    frequency frame (mergeable sketch) and a 1-value collect; with
    ``max_candidate_volume`` one extra aggregate of that frame down to
    the distinct count VALUES (bounded by the max observed frequency,
    not the vocabulary — see :func:`_budget_fit_frame`), a cumulative
    window over that small frame, and a second 1-value collect. The
    same move as reading :func:`key_skew_stats` before picking a join
    strategy, folded into the operator."""
    import math

    if not 0.0 < quantile < 1.0:
        raise ValueError(f"quantile must be in (0, 1), got {quantile}")
    if multiplier <= 0 or floor < 1:
        raise ValueError("multiplier must be > 0 and floor >= 1")
    if max_candidate_volume is not None and max_candidate_volume < 1:
        raise ValueError("max_candidate_volume must be >= 1")
    q = freq.agg(
        F.expr(f"percentile_approx({count_col}, {quantile!r}, 10000)").alias("q")
    ).first()["q"]
    if q is None:  # empty frame: nothing to cap
        return int(floor)
    cap = max(int(floor), int(math.ceil(float(q) * float(multiplier))))
    if max_candidate_volume is not None:
        budget = float(max_candidate_volume)
        # one action: the largest count value whose admitted volume fits
        # the budget (plus that volume), and the smallest one that
        # overflows it (None when the whole distribution fits)
        row = _budget_fit_frame(freq, count_col).agg(
            F.max(F.when(F.col("__cum") <= budget, F.col("__c"))).alias("fit"),
            F.max(F.when(F.col("__cum") <= budget, F.col("__cum"))).alias(
                "fit_vol"
            ),
            F.min(F.when(F.col("__cum") > budget, F.col("__c"))).alias("over"),
        ).first()
        budget_cap = int(row["fit"]) if row["fit"] is not None else 1
        quantile_cap, cap = cap, max(int(floor), min(cap, budget_cap))
        # "binds" = some count value actually overflows the budget (keys
        # are being cut) and the budget — not the quantile rule or the
        # floor — decided the final cap; a distribution that fits whole
        # stays silent even though the fitted value sits below the
        # quantile cap (lowering to max(count) cuts nothing)
        if (
            row["over"] is not None
            and cap == budget_cap
            and budget_cap < quantile_cap
        ):
            # the budget lowered the quantile-derived cap: make the
            # recall trade visible at fit time, not only in artifacts —
            # pairs mediated only by keys above the lowered cap are cut
            logger.info(
                "auto_frequency_cap: candidate-volume budget binds — "
                "cap lowered %d -> %d (admitted volume %s <= budget %d). "
                "Pairs mediated only by keys with count > %d are "
                "sacrificed for the work bound.",
                quantile_cap, budget_cap,
                int(row["fit_vol"]) if row["fit_vol"] is not None else 0,
                max_candidate_volume, budget_cap,
            )
        # the budget is actually exceeded only when a count value the
        # FINAL cap admits has cumulative volume past it — a floor (or
        # fitted cap) above max(count) admits nothing extra
        if row["over"] is not None and cap >= int(row["over"]):
            logger.warning(
                "auto_frequency_cap: floor=%d overrides the fitted "
                "budget cap %d — post-cap candidate volume exceeds "
                "max_candidate_volume=%d. Pass floor=1 to make the "
                "budget binding alone.",
                floor, budget_cap, max_candidate_volume,
            )
    return cap


def _budget_fit_frame(freq: DataFrame, count_col: str) -> DataFrame:
    """``(__c, __cum)``: for each distinct count value ``__c``, the
    candidate volume ``Σ count²`` a cap of ``__c`` would admit — every
    key with count ≤ c survives a cap of c, so the running sum of
    ``count²`` over counts ascending, evaluated AT a count value, is
    exactly that cap's admitted volume.

    Shape matters here: the per-key frequency frame has one row per
    distinct KEY, which scales with the corpus (billions of shingles at
    100 TB), so the cumulative sum is computed in two steps — first a
    hash aggregate ``groupBy(count) → Σ count²`` collapsing the frame to
    one row per distinct count VALUE (bounded by the max observed
    document frequency, realistically ≤ ~10⁶ rows at any corpus size),
    then the partition-less cumulative window over that bounded frame.
    Running the window directly over the per-key frame would funnel the
    whole vocabulary into a single task — the exact single-partition
    hazard this function exists to guard against (round-7 VERDICT
    finding #1; the aggregate-below-window shape is plan-asserted in
    tests/test_round8_hardening.py)."""
    per_value = (
        freq.select(F.col(count_col).cast("long").alias("__c"))
        .groupBy("__c")
        .agg(
            # cast BEFORE multiplying: long·long wraps negative past
            # 2^63 (df > ~3.04e9 — reachable at the corpus scale this
            # budget targets) and would silently understate the volume
            F.sum(F.col("__c").cast("double") * F.col("__c")).alias("__vol")
        )
    )
    return per_value.withColumn(
        "__cum",
        F.sum("__vol").over(
            Window.orderBy(F.col("__c")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on column ``on``, spreading each join key
    over ``salt`` sub-keys. Output schema equals a plain ``fact.join(dim,
    on, how)``. ``how`` supports inner/left."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join: how must be inner|left")
    if salt < 2:
        raise ValueError("salted_join: salt must be >= 2")
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_fact.join(salted_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")
