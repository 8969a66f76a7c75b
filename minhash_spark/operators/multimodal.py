"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_media`` raises NotImplementedError for real codecs, and
``fake_decode`` provides a deterministic stand-in so the Spark-side plumbing
— schema, partitioning, UDF signature, batch shape — is real and tested.
Swapping in Pillow/torchaudio later only replaces the per-batch kernel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_media(data: bytes, media_type: str):
    """Real decode entry point — requires codec libraries not present in this
    environment. The plumbing around it is exercised via fake_decode."""
    raise NotImplementedError(
        f"decoding {media_type!r} requires external codec libraries "
        "(Pillow / ffmpeg / torchaudio); use fake_decode for plumbing tests"
    )


def fake_decode(data: bytes, media_type: str, feat_dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256 of the payload seeds
    a fixed-size float vector. Same batch shape/dtype a real extractor has."""
    digest = hashlib.sha256(data).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(feat_dim).astype(np.float32)


def extract_media_features(
    df: DataFrame,
    media_col: str = "html",
    url_col: str = "url",
    media_type: str = "html",
    feat_dim: int = 8,
    decoder=fake_decode,
) -> DataFrame:
    """mapInPandas over (url, binary) → MEDIA_META_SCHEMA rows. Binary
    payloads stay inside Arrow record batches end-to-end; keep
    spark.sql.execution.arrow.maxRecordsPerBatch small if payloads are
    multi-MB so batches fit executor memory."""
    src = df.select(
        F.col(url_col).alias("url"), F.col(media_col).alias("media")
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf["url"], pdf["media"]):
                payload = bytes(data) if data is not None else b""
                rows.append(
                    {
                        "url": url,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "media_type": media_type,
                        "feature": decoder(payload, media_type, feat_dim),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA])

    return src.mapInPandas(_extract, MEDIA_META_SCHEMA)
