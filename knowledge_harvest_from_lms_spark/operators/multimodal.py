"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata (driver brief).

The decode/feature kernels are STUBS behind an explicit gate — the
image/audio libraries are not in this container — but the Spark-side
contract is real and tested: schemas, Arrow batch shapes, mapInPandas
signatures, partition-by-modality layout. A deterministic fake
("features" = seeded bytes-hash projection) stands in for the decoder
so downstream joins/aggregations are exercisable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType()),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 32

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)

HAS_REAL_DECODERS = False  # PIL / torchaudio / av not in this container


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in: seeded projection of the content hash.
    Replace with a real decoder on clusters with media libs."""
    h = hashlib.blake2b(content or b"", digest_size=8).digest()
    rng = np.random.Generator(np.random.PCG64(int.from_bytes(h, "big")))
    return [float(x) for x in rng.standard_normal(dim).astype(np.float32)]


def decode_real(content: bytes, modality: str):  # pragma: no cover
    raise NotImplementedError(
        "real media decoding requires PIL/torchaudio/av; this container "
        "ships the Spark plumbing with a deterministic fake "
        "(extract_features(..., use_stub=True))"
    )


def extract_features(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """content binary → features array<float>, Arrow-batched, one
    decoder instance per python worker."""
    if not use_stub and not HAS_REAL_DECODERS:
        raise NotImplementedError("no real decoders in this container")

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            feats = [_fake_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                    "decoder": ["stub-blake2b-v1"] * len(pdf),
                }
            )

    # modality partitioning: decode cost is modality-specific; keeps
    # Arrow batches homogeneous for a real decoder
    return media.repartition("modality").mapInPandas(fn, schema=FEATURES_SCHEMA)


def synth_media(spark, n_rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n_rows):
        modality = ["image", "audio", "video"][i % 3]
        content = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        rows.append(
            (
                i,
                f"https://media.example/{modality}/{i}",
                modality,
                bytearray(content),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                64 if modality != "audio" else None,
                64 if modality != "audio" else None,
                None if modality == "image" else 1000 + i,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)
