"""Iceberg-or-parquet table IO shim (S3/S4/S7/S9).

Production targets an Iceberg catalog (`spark.sql.catalog.kg = ...`
with partition transforms like days(warc_ts)); this sandbox has no
Iceberg jars, so the same API falls back to day/rel-partitioned
parquet under a warehouse directory, preserving the physical layout
decisions (SURVEY.md §4 "Physical layout"):

  web_pages  partitioned by days(warc_ts)
  kg.triples partitioned by rel
  kg.edges   partitioned by rel

Writes are idempotent overwrites at partition granularity
(dynamic partition overwrite = the parquet analog of Iceberg's
overwritePartitions), which is what makes stage re-runs safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str, namespace: str = "kg"):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.namespace = namespace
        self.use_iceberg = iceberg_available(spark)

    def _path(self, table: str) -> str:
        return f"{self.warehouse}/{self.namespace}/{table}"

    def save(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        if self.use_iceberg:  # pragma: no cover - no jars in sandbox
            writer = df.writeTo(f"{self.namespace}.{table}")
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
            return
        # dynamic partition overwrite: only touched partitions rewritten
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def load(self, table: str) -> DataFrame:
        if self.use_iceberg:  # pragma: no cover
            return self.spark.read.table(f"{self.namespace}.{table}")
        return self.spark.read.parquet(self._path(table))

    # --- canonical tables -------------------------------------------------

    def save_web_pages(self, pages: DataFrame) -> None:
        self.save(
            pages.withColumn("day", F.to_date("warc_ts")),
            "web_pages",
            partition_by=["day"],
        )

    # --- bucketed tables (co-located joins) --------------------------------

    def save_bucketed(
        self, df: DataFrame, table: str, bucket_col: str, n_buckets: int = 32
    ) -> None:
        """Write a bucketed+sorted table into the session catalog
        (Iceberg: ``bucket(N, col)`` partition transform; parquet
        fallback: ``bucketBy`` via saveAsTable). Two tables bucketed
        identically on the join key join WITHOUT a shuffle — at 100 TB
        this is the difference between exchanging both sides of a
        url-keyed join and exchanging nothing (see
        tests/test_report_and_catalog.py plan assertion)."""
        name = f"{self.namespace}_{table}"
        (
            df.write.mode("overwrite")
            .option("path", self._path(table + "_bucketed"))
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(name)
        )

    def load_bucketed(self, table: str) -> DataFrame:
        return self.spark.read.table(f"{self.namespace}_{table}")

    # --- Iceberg DDL (the production layout, runnable where jars exist) ---

    def iceberg_ddl(self) -> dict[str, str]:
        """The exact CREATE TABLE statements a jar-equipped cluster
        runs for this engine's tables — partition transforms match the
        parquet fallback's directory layout (days(warc_ts) / rel /
        bucket(url)), so data written here is drop-in migratable."""
        ns = self.namespace
        loc = self.warehouse
        return {
            "web_pages": (
                f"CREATE TABLE IF NOT EXISTS {ns}.web_pages (\n"
                "  url STRING, warc_ts TIMESTAMP, html BINARY,\n"
                "  text STRING, lang STRING)\n"
                "USING iceberg\n"
                "PARTITIONED BY (days(warc_ts), bucket(256, url))\n"
                f"LOCATION '{loc}/{ns}/web_pages'\n"
                "TBLPROPERTIES ('write.distribution-mode'='hash',\n"
                "  'write.target-file-size-bytes'='268435456')"
            ),
            "triples": (
                f"CREATE TABLE IF NOT EXISTS {ns}.triples (\n"
                "  rel STRING, ents ARRAY<STRING>, score DOUBLE,\n"
                "  weight DOUBLE, rank INT)\n"
                "USING iceberg\nPARTITIONED BY (rel)\n"
                f"LOCATION '{loc}/{ns}/triples'"
            ),
            "edges": (
                f"CREATE TABLE IF NOT EXISTS {ns}.edges (\n"
                "  src STRING, rel STRING, dst STRING, weight DOUBLE,\n"
                "  n_mentions BIGINT, src_id BIGINT, dst_id BIGINT)\n"
                "USING iceberg\nPARTITIONED BY (rel)\n"
                f"LOCATION '{loc}/{ns}/edges'"
            ),
            "vertices": (
                f"CREATE TABLE IF NOT EXISTS {ns}.vertices (\n"
                "  ent_id BIGINT, ent STRING)\nUSING iceberg\n"
                f"LOCATION '{loc}/{ns}/vertices'"
            ),
        }

    def save_triples(self, triples: DataFrame) -> None:
        self.save(triples, "triples", partition_by=["rel"])

    def save_graph(self, edges: DataFrame, vertices: DataFrame) -> None:
        self.save(edges, "edges", partition_by=["rel"])
        self.save(vertices, "vertices")
