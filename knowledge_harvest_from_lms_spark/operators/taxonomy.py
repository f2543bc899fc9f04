"""Taxonomy induction from mined IsA evidence — best-parent
selection plus mutual-edge resolution.

Raw pattern-mined IsA triples form a noisy multigraph ("apple isa
fruit" n=40, "apple isa company" n=25, "fruit isa apple" n=1 from a
garbled page). Probase-style taxonomy assembly picks, per child, the
single best-supported parent, then resolves the 2-cycles noise
creates (a chose b AND b chose a — one of them is backwards). Deeper
cycles are broken by construction once mutual edges are resolved
deterministically at each length-2 loop; longer loops surviving
best-parent selection are rare enough that Probase handles them the
same local way. Downstream, `bounded_closure`
(`operators/randomwalk.py`, q101) materializes ancestor sets over the
resulting forest.

Contracts (each the deterministic, engine-replayable choice):

  * best parent per child = argmax by ``(n, parent)`` — support
    first, ties to the lexicographically LAST parent (a max(struct)
    AGGREGATE, so hot children with 10^5 candidate parents collapse
    map-side; a row_number window over the child key would shuffle
    the full candidate stream to one reducer per hot child).
  * mutual pair (a→b and b→a both selected): keep the direction
    with the higher support; at equal support keep the edge whose
    CHILD is lexicographically smaller (one deterministic survivor
    per pair, never both, never neither).

Plan shape: one map-side-combining aggregate + one self-equi-join on
the (child, parent) pair key (both sides are the already-aggregated
best-parent table — |children| rows, not |triples|), then a null-safe
keep predicate. No window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def best_parents(
    isa: DataFrame,
    child_col: str = "hypo",
    parent_col: str = "hyper",
    n_col: str = "n",
) -> DataFrame:
    """One row per child: ``(child, parent, n)`` with the
    best-supported parent (ties to lexicographically last)."""
    pick = F.max(
        F.struct(F.col(n_col).alias("n"), F.col(parent_col).alias("p"))
    ).alias("b")
    return (
        isa.groupBy(F.col(child_col).alias("child"))
        .agg(pick)
        .select("child", F.col("b.p").alias("parent"), F.col("b.n").alias("n"))
    )


def induce_taxonomy(
    isa: DataFrame,
    child_col: str = "hypo",
    parent_col: str = "hyper",
    n_col: str = "n",
) -> DataFrame:
    """Best-parent forest with mutual (length-2) cycles resolved:
    ``(child, parent, n)`` where no two output rows are mutual."""
    bp = best_parents(isa, child_col, parent_col, n_col)
    rev = bp.select(
        F.col("parent").alias("child"),
        F.col("child").alias("parent"),
        F.col("n").alias("rev_n"),
    )
    # left join against the reversed table: rev_n non-null marks a
    # mutual pair; the keep predicate selects exactly one survivor
    j = bp.join(rev, ["child", "parent"], "left")
    keep = (
        F.col("rev_n").isNull()
        | (F.col("n") > F.col("rev_n"))
        | ((F.col("n") == F.col("rev_n")) & (F.col("child") < F.col("parent")))
    )
    return j.filter(keep).select("child", "parent", "n")
