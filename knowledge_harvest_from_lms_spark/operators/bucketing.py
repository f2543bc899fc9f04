"""Bucketed tables for exchange-free co-located joins.

The shuffle a big equi-join pays is avoidable when both sides are
written bucketed on the join key with the same bucket count: Spark's
scan then reports the hash-partitioning as its output partitioning
and the SortMergeJoin consumes both sides WITHOUT an Exchange — the
join cost collapses to a per-bucket local sort (or nothing, with
sortBy). This is the parquet-datasource equivalent of Iceberg's
`bucket(N, key)` partition transform already declared in
`sources/catalog.py`'s DDL; on a 100 TB fact table joined repeatedly
on the same key (url, entity id), bucketing converts EVERY downstream
join from a full shuffle into a co-located zip.

Caveats encoded here rather than rediscovered:
  * bucketing requires `saveAsTable` (a catalog table — the
    in-memory/derby catalog works; plain `.parquet(path)` silently
    drops bucket metadata);
  * both sides need the SAME bucket count, or Spark re-shuffles the
    mismatched side (`spark.sql.bucketing.coalesceBucketsInJoin`
    can bridge ratios, off by default);
  * `spark.sql.sources.bucketing.enabled` must stay true (default);
  * the planner silently DISABLES bucketed scans when it picks a
    broadcast join (harmless — no shuffle either way);
  * per-bucket sort elision additionally needs one file per bucket
    (write_bucketed repartitions to guarantee it) AND
    `spark.sql.legacy.bucketedTableScan.outputOrdering=true` —
    Spark 3+ stopped reporting sorted scan output by default
    (SPARK-28216) because multi-file buckets would need a merge.

`tests/test_bucketing.py` pins the plan contract: zero Exchange
nodes under the join of two co-bucketed tables, and a shuffle
reappears when one side is unbucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default bucket-sorted)
    catalog table. Sorting at write time additionally removes the
    per-bucket sort from every downstream SortMergeJoin."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # repartition on the bucket key first: without it every write task
    # emits a file per bucket (tasks x buckets small files), and a
    # bucket split across files loses the sorted-read guarantee, so
    # downstream SortMergeJoins re-sort. repartition's hashpartitioning
    # uses the same murmur3 pmod as the bucket spec, so each task holds
    # exactly one bucket -> one file per bucket.
    writer = (
        df.repartition(n_buckets, *cols)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. The
    plan contract (asserted in tests): NO Exchange on either side."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on, how)
