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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
