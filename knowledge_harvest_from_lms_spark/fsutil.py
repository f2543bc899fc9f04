"""Shared table-path filesystem helpers (the one place the
Hadoop-FS-vs-driver-local reasoning lives, instead of three copies —
review r3).

Paths may be s3a:// / hdfs:// tables, so existence probes and deletes
go through the Hadoop FileSystem API, never driver-local ``os.path``.
Overwrites of tables the new plan READS stage through a tmp dir
first; on Iceberg these become transactional snapshot commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(sess: SparkSession, path: str):
    jvm = sess._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(sess._jsc.hadoopConfiguration()), p


def hadoop_exists(sess: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(sess, path)
    return fs.exists(p)


def hadoop_delete(sess: SparkSession, path: str) -> None:
    fs, p = _fs_and_path(sess, path)
    if fs.exists(p):
        fs.delete(p, True)


def stage_overwrite_all(named: list[tuple[DataFrame, str]]) -> None:
    """Overwrite each (df, path) even when the dfs' lazy plans READ
    the paths — including each OTHER's (e.g. merge_into_graph's edge
    plan joins the existing vertex table, so promoting vertices first
    would pull files out from under the still-lazy edge plan). All
    dfs materialize to tmp dirs FIRST, then every path is promoted,
    then tmps are removed. An Iceberg catalog collapses this into a
    transactional multi-table snapshot commit.

    Crash semantics (ADVICE r3 — the honest parquet-level story until
    the Iceberg transactional commit lands, ROADMAP item 2):

    * Stale ``<path>.tmp`` dirs from a previous crashed run are deleted
      on entry, so a retry never promotes a half-written stage from an
      EARLIER generation.
    * The promote loop is NOT atomic across tables: a crash between
      promotes leaves a mixed-generation set. Promotion runs in LIST
      ORDER, so callers must order tables base-first / most-derived
      LAST (merge_into_graph promotes vertices before edges, and the
      streaming ledger last of all: a crash then leaves new vertices +
      old edges, which the ledger replay re-derives, and never a
      ledger that claims an un-promoted table). Each individual
      promote is itself a parquet overwrite, so a reader racing one
      table mid-overwrite can see a missing/partial dir — single-
      writer-per-table is assumed here; concurrent readers need the
      Iceberg snapshot commit."""
    sess = named[0][0].sparkSession
    tmps = []
    for _, path in named:
        hadoop_delete(sess, path.rstrip("/") + ".tmp")
    for df, path in named:
        tmp = path.rstrip("/") + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        tmps.append((tmp, path))
    for tmp, path in tmps:
        sess.read.parquet(tmp).write.mode("overwrite").parquet(path)
    for tmp, _ in tmps:
        hadoop_delete(sess, tmp)


def stage_overwrite(df: DataFrame, path: str) -> None:
    stage_overwrite_all([(df, path)])
