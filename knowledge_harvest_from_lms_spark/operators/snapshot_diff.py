"""Snapshot diff — dataset-versioning change detection.

A curation pipeline re-crawls, re-filters, and re-scores; every
release needs "what changed vs the last snapshot" — for incremental
downstream work (only re-embed changed docs), for release notes, and
for catching silent pipeline regressions (a filter change that drops
10% of a language shows up as a `removed` spike). TxnLog's
``read_changes`` answers this for APPEND-only logs from metadata; the
operator below answers it for any two arbitrary snapshots by content,
the way Delta's `table_changes` falls back to a diff after a rewrite.

Plan shape: ONE full-outer join co-partitioned on the key columns —
both sides shuffle exactly once on the same key, so AQE can plan it
as a plain sort-merge; the value comparison is a null-safe
column-wise predicate (codegen, no hashing round-trip, no Python).
At 100 TB the join is the floor for a CONTENT diff — anything
cheaper needs pre-bucketed tables (operators/bucketing.py makes the
same diff zero-Exchange) or an append-only log (txn.read_changes).

Determinism: output is a projection of input rows plus a literal
change tag — no floats are created, so the diff is hash-exact and
the DuckDB oracle (q84) replays it with IS DISTINCT FROM.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots sharing a schema:
    ``(key_cols..., change)`` with ``change`` in
    ``added`` (key only in new), ``removed`` (key only in old),
    ``changed`` (key in both, any compare column differs under
    null-safe equality). Unchanged rows are omitted — at web scale
    they are the overwhelming majority and nobody reads them.

    ``compare_cols`` defaults to every shared non-key column. Key
    columns must be unique per snapshot (a versioned table's primary
    key); duplicate keys make "changed" ill-defined and this operator
    does not try to guess."""
    if not key_cols:
        raise ValueError("need at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in key_cols
        ]
    o = old.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, on=key_cols, how="full_outer")
    differs = (
        reduce(
            lambda a, b: a | b,
            [
                ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
                for c in compare_cols
            ],
        )
        if compare_cols
        else F.lit(False)
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )
