"""Entity-resolution operators: blocking, field rules, best match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_processor_spark.operators import linkage

A = "id long, name string, blk string, bal double"


def test_field_rules_and_block_scoring(spark):
    a = spark.createDataFrame(
        [(1, "alpha", "x", 10.0), (2, None, "x", 5.0)], A)
    b = spark.createDataFrame(
        [(11, "alpha", "x", 10.2),    # exact name, bal within tol
         (12, "alphq", "x", 99.0),    # edit 1, bal miss
         (13, "omega", "x", 10.0),    # name miss
         (14, "alpha", "y", 10.0)],   # other block: never compared
        A,
    )
    rules = [
        linkage.field_rule("name", "levenshtein",
                           w_match=4, w_near=2, w_miss=-3, max_edit=2),
        linkage.field_rule("bal", "numeric", w_match=1, w_miss=-1,
                           tol=0.5),
    ]
    scored = linkage.block_and_score(a, b, "id", "id", ["blk"], rules)
    got = {(r.a_key, r.b_key): r.score for r in scored.collect()}
    assert got[(1, 11)] == 5 and got[(1, 12)] == 1 and got[(1, 13)] == -2
    assert (1, 14) not in got  # blocked away
    # nulls score w_miss, never match
    assert got[(2, 11)] == -3 + -1
    best = {r.a_key: (r.b_key, r.score)
            for r in linkage.best_matches(scored, 3).collect()}
    assert best == {1: (11, 5)}  # a=2 unmatched -> absent


def test_best_match_tiebreak_lowest_b_key(spark):
    scored = spark.createDataFrame(
        [(1, 20, 5), (1, 10, 5), (1, 5, 4)],
        "a_key long, b_key long, score long",
    )
    rows = linkage.best_matches(scored, 3).collect()
    assert [(r.a_key, r.b_key, r.score) for r in rows] == [(1, 10, 5)]


def test_oversized_blocks_drop_entirely(spark):
    a = spark.createDataFrame(
        [(i, "n", "big", 1.0) for i in range(5)] + [(99, "n", "ok", 1.0)],
        A,
    )
    b = spark.createDataFrame([(7, "n", "big", 1.0), (8, "n", "ok", 1.0)], A)
    rules = [linkage.field_rule("name", "exact")]
    scored = linkage.block_and_score(
        a, b, "id", "id", ["blk"], rules, max_block=4)
    keys = {(r.a_key, r.b_key) for r in scored.collect()}
    assert keys == {(99, 8)}  # the 5-row "big" block dropped on the a side


def test_unknown_rule_kind_raises(spark):
    with pytest.raises(ValueError):
        linkage.field_rule("name", "soundex")
