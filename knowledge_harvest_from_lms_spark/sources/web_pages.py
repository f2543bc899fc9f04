"""Deterministic synthetic `web_pages` generator (FIXTURES.md §1,
`input_hint` schema: url, warc_ts, html binary, text, lang).

Generation is distributed (mapInPandas over spark.range) and
deterministic per row id (PCG64 seeded with blake2b(seed, id)):
re-running at any partitioning yields byte-identical rows. Every k-th
row embeds an entity-bearing sentence built from the fixture relations
so corpus-grounding joins have hits.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_FILLER = (
    "web data page site content article section link image nav spark "
    "engine query table scan join filter group sort window batch stream "
    "note post list item view user time day news info"
).split()

HTML_TEMPLATE = "<html><head><title>p</title></head><body><p>{}</p></body></html>"
ENTITY_EVERY_K = 7
LANGS = ["de", "fr", "es"]


def _entity_sentences() -> list[str]:
    from ..functions.textops import get_n_ents, get_sent
    from .fixtures import FIXTURE_RELATIONS

    out = []
    for rel in FIXTURE_RELATIONS:
        prompts = rel["init_prompts"] + rel.get("prompts", [])
        for tup in rel["seed_ent_tuples"]:
            ents = [e.replace("_", " ") for e in tup]
            for p in prompts:
                if get_n_ents(p) == len(ents):
                    out.append(get_sent(p, ents).lower())
    return sorted(set(out))


def _row_rng(seed: int, i: int) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h, "big")))


def synth_web_pages(
    spark: SparkSession, n_rows: int, seed: int = 42, n_partitions: int | None = None
) -> DataFrame:
    ent_sents = _entity_sentences()
    base_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in pdf["id"]:
                i = int(i)
                rng = _row_rng(seed, i)
                n_sent = 1 + int(rng.integers(0, 5))
                sents = []
                for _ in range(n_sent):
                    n_w = 5 + int(rng.integers(0, 10))
                    ws = [_FILLER[int(j)] for j in rng.integers(0, len(_FILLER), n_w)]
                    sents.append(" ".join(ws) + " .")
                if i % ENTITY_EVERY_K == 0:
                    sents.insert(
                        int(rng.integers(0, len(sents) + 1)),
                        ent_sents[i % len(ent_sents)],
                    )
                text = " ".join(sents)
                lang = "en" if rng.random() < 0.95 else LANGS[int(rng.integers(0, 3))]
                rows["url"].append(f"https://host{i % 1000}.example/p/{i}")
                rows["warc_ts"].append(
                    base_ts + timedelta(days=i % 30, seconds=i)
                )
                rows["html"].append(HTML_TEMPLATE.format(text).encode("utf-8"))
                rows["text"].append(text)
                rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    n_partitions = n_partitions or max(8, n_rows // 25_000)
    return spark.range(n_rows, numPartitions=n_partitions).mapInPandas(
        gen, schema=WEB_PAGES_SCHEMA
    )


def write_web_pages(df: DataFrame, path: str) -> None:
    """Partitioned like the Iceberg layout (days(warc_ts) transform →
    a `day` partition column on plain parquet)."""
    (
        df.withColumn("day", F.to_date("warc_ts"))
        .repartition("day")
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(path)
    )
