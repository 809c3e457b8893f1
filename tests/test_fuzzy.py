"""Blocked edit-distance joins (functions.fuzzy): verification vs brute
force, the stated recall contract, hot-block caps, and the self-join form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions.fuzzy import (
    fuzzy_dedup_pairs,
    fuzzy_join,
    normalize_text,
)

LEFT = [
    (1, "Acme Industrial Supplies"),
    (2, "Northwind Trading Co"),
    (3, "Globex  Corporation"),  # double space — normalization target
    (4, "Initech LLC"),
]
RIGHT = [
    (10, "Acme Industral Supplies"),   # 1 deletion mid-string
    (11, "northwind trading co"),      # case only → distance 0
    (12, "Globex Corporation"),        # whitespace only → distance 0
    (13, "Umbrella Corp"),             # no match
    (14, "Acme Industrial Suppliers"), # 1 edit near the end
]


def _lr(spark):
    l = spark.createDataFrame(LEFT, "lid int, name string")
    r = spark.createDataFrame(RIGHT, "rid int, cand string")
    return l, r


def test_fuzzy_join_finds_typo_matches(spark):
    l, r = _lr(spark)
    out = fuzzy_join(l, r, "name", "cand", max_distance=2, block_on="prefix")
    got = {(row["lid"], row["rid"]): row["distance"] for row in out.collect()}
    assert got == {(1, 10): 1, (2, 11): 0, (3, 12): 0, (1, 14): 1}


def test_fuzzy_join_matches_bruteforce_within_blocks(spark):
    l, r = _lr(spark)
    out = fuzzy_join(l, r, "name", "cand", max_distance=2, block_on="prefix",
                     block_len=3)
    got = {(row["lid"], row["rid"]) for row in out.collect()}
    # brute force with identical normalization, restricted to shared blocks
    lrows = [(i, n) for i, n in LEFT]
    rrows = [(i, n) for i, n in RIGHT]
    import re

    def norm(s):
        return re.sub(r"\s+", " ", s.strip().lower())

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (li, ri)
        for li, ln in lrows
        for ri, rn in rrows
        if norm(ln)[:3] == norm(rn)[:3] and lev(norm(ln), norm(rn)) <= 2
    }
    assert got == want


def test_recall_contract_edit_inside_block_is_missed(spark):
    # the documented limitation: an edit within the blocked prefix moves
    # the string to another block, so the pair is (knowingly) missed
    l = spark.createDataFrame([(1, "walmart stores")], "lid int, name string")
    r = spark.createDataFrame([(2, "falmart stores")], "rid int, cand string")
    pref = fuzzy_join(l, r, "name", "cand", max_distance=1, block_on="prefix")
    assert pref.count() == 0
    # ...and the suffix-block pass of the same plan catches it
    suff = fuzzy_join(l, r, "name", "cand", max_distance=1, block_on="suffix")
    assert suff.count() == 1


def test_hot_block_cap(spark):
    l = spark.createDataFrame([(1, "aaa name")], "lid int, name string")
    r = spark.createDataFrame(
        [(i, "aaa name") for i in range(50)], "rid int, cand string"
    )
    capped = fuzzy_join(l, r, "name", "cand", max_block_freq=10)
    assert capped.count() == 0
    open_ = fuzzy_join(l, r, "name", "cand", max_block_freq=None)
    assert open_.count() == 50


def test_fuzzy_dedup_pairs_self_join(spark):
    df = spark.createDataFrame(
        [
            (1, "Stanford University"),
            (2, "stanford universty"),
            (3, "MIT"),
            (4, "Stanford  University "),
        ],
        "id int, inst string",
    )
    out = fuzzy_dedup_pairs(df, "inst", "id", max_distance=2)
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in out.collect()}
    assert got == {(1, 2): 1, (1, 4): 0, (2, 4): 1}


def test_overlapping_column_names_get_r_suffix(spark):
    l = spark.createDataFrame([(1, "acme co")], "id int, name string")
    r = spark.createDataFrame([(2, "acme co")], "id int, name string")
    out = fuzzy_join(l, r, "name", "name")
    assert set(out.columns) == {"id", "name", "id_r", "name_r", "distance"}
    assert out.count() == 1
