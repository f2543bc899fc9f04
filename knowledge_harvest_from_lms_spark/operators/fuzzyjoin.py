"""Blocked fuzzy record-linkage join on Jaro-Winkler similarity.

Entity canonicalization needs a string-similarity join that tolerates
typos and morphological variants where exact/minhash keys miss
(reference surfaces the need via its casing-variant enumeration,
`/root/reference/data_utils/data_utils.py:10-27`; this is the scaled
record-linkage generalization). Levenshtein (q25) is already pinned
against DuckDB's native; Jaro-Winkler is the other standard linkage
metric (Winkler 1990, US Census record linkage) — prefix-weighted, so
it favors the left-anchored variants entity names actually exhibit.

Semantics are pinned to DuckDB's NATIVE `jaro_winkler_similarity` (an
independent implementation, the q59-style oracle): standard Jaro with
the match window max(|a|,|b|)/2 - 1 and half-transposition count,
Winkler prefix scaling p=0.1 over at most 4 shared leading chars,
applied only when jaro > 0.7 (strict), and 0.0 when either side is
empty (even if both are). Fuzzed 4000 random string pairs + the
boost-threshold boundary: exact float equality against DuckDB 1.0.

Scale shape: an all-pairs similarity join is O(n^2); the standard fix
is BLOCKING — candidates share a cheap deterministic block key, the
expensive metric runs only inside blocks. Block key here is the
lowercased first character (the classic linkage blocker; swap in
soundex/prefix-k via `block_expr`). The plan is a plain equi-join on
the block key — shuffle-partitionable, AQE-skew-splittable — followed
by ONE Arrow-batched pandas UDF over the candidate pairs. Recall
contract: pairs whose keys differ in the first character are missed
BY DESIGN (documented, and the oracle replays the same blocking, so
the correctness check compares identical candidate sets).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_PREFIX_SCALE = 0.1
_BOOST_THRESHOLD = 0.7
_MAX_PREFIX = 4


def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    # clamp: max(1,1)//2 - 1 is -1, which would forbid the diagonal
    # match two identical single-char strings need (DuckDB: 1.0)
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    return (
        matches / l1
        + matches / l2
        + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler_py(s1: str, s2: str) -> float:
    """Scalar Jaro-Winkler, float-exact vs DuckDB's native function
    (same formula, same operation order — see module docstring)."""
    j = _jaro(s1, s2)
    if j <= _BOOST_THRESHOLD:
        return j
    prefix = 0
    for a, b in zip(s1, s2):
        if a == b and prefix < _MAX_PREFIX:
            prefix += 1
        else:
            break
    return j + prefix * _PREFIX_SCALE * (1.0 - j)


def _jw_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batch kernel for the Jaro-Winkler column. NULL on either
    side -> NULL (SQL function convention). Strings here are
    entity-name-sized; the O(|a|*|b|) inner loop is bounded by the
    blocker upstream."""
    out = [
        None if (x is None or y is None) else jaro_winkler_py(x, y)
        for x, y in zip(a, b)
    ]
    return pd.Series(out, dtype="float64")


def jaro_winkler_udf() -> "F.udf":
    """Build the pandas UDF lazily: a module-level @pandas_udf would
    re-run its DDL-string parse when the WORKER re-imports this
    module to unpickle the kernel — with no SparkContext there, that
    raises SESSION_OR_CONTEXT_NOT_EXISTS. Constructing it on the
    driver per call keeps worker imports side-effect-free."""
    return pandas_udf(_jw_batch, "double")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    threshold: float = 0.85,
    block_expr: Column | None = None,
) -> DataFrame:
    """Blocked fuzzy join: rows of `left` x `right` whose keys share
    a block (default: lowercased first character) and score
    jaro_winkler >= threshold. Output = left columns + right columns
    + `jw_sim` (rounded to 9 decimals for stable publication).

    `block_expr`, when given, is applied to EACH side's key column to
    derive the block (e.g. ``lambda c: F.soundex(c)`` semantics via a
    prepared Column is not possible — pass an expression built from
    ``F.col("__fj_key")``, which this function binds to the side's
    key). Keys that are NULL never match (their block is NULL and the
    equi-join drops it)."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")

    def blocked(df: DataFrame, key: str, side: str) -> DataFrame:
        bound = df.withColumn("__fj_key", F.col(key))
        blk = (
            block_expr
            if block_expr is not None
            else F.lower(F.substring(F.col("__fj_key"), 1, 1))
        )
        return bound.withColumn(f"__blk_{side}", blk).drop("__fj_key")

    lb = blocked(left, left_key, "l")
    rb = blocked(right, right_key, "r")
    cand = lb.join(
        rb, F.col("__blk_l") == F.col("__blk_r"), "inner"
    ).drop("__blk_l", "__blk_r")
    sim = jaro_winkler_udf()(F.col(left_key), F.col(right_key))
    return (
        cand.withColumn("jw_sim", F.round(sim, 9))
        .filter(F.col("jw_sim") >= F.lit(threshold))
    )
