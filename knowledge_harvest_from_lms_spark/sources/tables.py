"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

These are plain parquet scans — Catalyst pushes filters and prunes
columns into them for free; every query in plans/queries.py relies on
that rather than pre-filtering here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for n, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(n)
