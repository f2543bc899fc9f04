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
    transactional multi-table snapshot commit."""
    sess = named[0][0].sparkSession
    tmps = []
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
