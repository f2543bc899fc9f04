"""Blocked Jaro-Winkler fuzzy join (operators/fuzzyjoin.py): the
scalar metric is pinned float-for-float against DuckDB's NATIVE
jaro_winkler_similarity (an independent implementation — the q25/q59
oracle style), and the join's blocking/threshold/NULL contracts are
exercised end-to-end."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.fuzzyjoin import (
    fuzzy_join,
    jaro_winkler_py,
)


def _duck_jw(con, a, b):
    return con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]


def test_scalar_matches_duckdb_fuzz():
    """4000 random pairs over a small alphabet (maximizing matches,
    transpositions and shared prefixes): exact float equality."""
    con = duckdb.connect()
    rng = random.Random(7)
    for _ in range(4000):
        s1 = "".join(
            rng.choice("abcd_ xyz") for _ in range(rng.randint(0, 10))
        )
        s2 = "".join(
            rng.choice("abcd_ xyz") for _ in range(rng.randint(0, 10))
        )
        assert jaro_winkler_py(s1, s2) == _duck_jw(con, s1, s2), (s1, s2)


def test_scalar_known_values():
    """The textbook pairs (Winkler 1990) plus the edge contracts:
    both-empty is 0.0 (DuckDB convention, NOT 1.0), boost only above
    jaro 0.7, prefix capped at 4."""
    assert jaro_winkler_py("martha", "marhta") == pytest.approx(
        0.9611111111111111, abs=0
    )
    # 0.84 in exact double arithmetic (0.822... + 1*0.1*(1-0.822...))
    assert jaro_winkler_py("dwayne", "duane") == 0.8400000000000001
    # identical single-char strings need the match-window clamp
    assert jaro_winkler_py("z", "z") == 1.0
    assert jaro_winkler_py("", "") == 0.0
    assert jaro_winkler_py("abc", "") == 0.0
    assert jaro_winkler_py("same", "same") == 1.0
    # jaro below the 0.7 boost threshold: prefix must NOT be applied
    low = jaro_winkler_py("abxxxxxxxx", "abyyyyyyyyyy")
    assert low == pytest.approx(0.45555555555555555, abs=0)


def test_join_blocks_and_thresholds(spark):
    left = spark.createDataFrame(
        [("gear",), ("cold",), ("zeta",)], "name string"
    )
    right = spark.createDataFrame(
        [("gears",), ("old",), ("zeta",), (None,)], "cand string"
    )
    out = fuzzy_join(left, right, "name", "cand", threshold=0.84)
    rows = {(r.name, r.cand): r.jw_sim for r in out.collect()}
    # gear/gears passes; zeta/zeta exact; cold/old is a TRUE fuzzy
    # match (jw 0.917) but blocked away by the first-char blocker —
    # the documented recall contract; NULL never matches
    assert ("gear", "gears") in rows
    assert rows[("zeta", "zeta")] == 1.0
    assert ("cold", "old") not in rows
    assert all(c is not None for _, c in rows)


def test_join_scores_match_duckdb(spark):
    """End-to-end: every emitted pair's score equals DuckDB's native
    function on the same pair (after the same round-9)."""
    words = ["anvil", "anvils", "anvi", "bolt", "bolts", "blot", "bol"]
    left = spark.createDataFrame([(w,) for w in words], "a string")
    right = spark.createDataFrame([(w,) for w in words], "b string")
    out = fuzzy_join(left, right, "a", "b", threshold=0.8).collect()
    assert out, "expected at least the identity pairs"
    con = duckdb.connect()
    for r in out:
        assert r.jw_sim == round(_duck_jw(con, r.a, r.b), 9), r


def test_custom_block_expr(spark):
    """block_expr binds to __fj_key per side: blocking on the first
    TWO chars must drop gear/gars (blocks 'ge' vs 'ga') while keeping
    gear/gears."""
    left = spark.createDataFrame([("gear",)], "a string")
    right = spark.createDataFrame([("gears",), ("gars",)], "b string")
    out = fuzzy_join(
        left,
        right,
        "a",
        "b",
        threshold=0.5,
        block_expr=F.lower(F.substring(F.col("__fj_key"), 1, 2)),
    )
    got = {r.b for r in out.collect()}
    assert got == {"gears"}


def test_threshold_validation():
    with pytest.raises(ValueError):
        fuzzy_join(None, None, "a", "b", threshold=1.5)
