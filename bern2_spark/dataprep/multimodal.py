"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError unless
``deterministic_fake=True``, which produces a seeded fake feature
vector so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id string, media_type string, width int, height int, "
                "payload binary")
FEATURE_SCHEMA = ("doc_id string, media_type string, n_bytes int, "
                  "feature array<float>")


def decode_image(payload: bytes):
    """Real decode would go through PIL/libvips here."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use extract_features(deterministic_fake=True) for "
        "the plumbing path")


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture: derive a deterministic binary payload per doc."""
    return docs.select(
        "doc_id",
        F.lit("image/png").alias("media_type"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.encode(F.substring(F.col(text_col), 1, 256), "utf-8")
        .alias("payload"))


def extract_features(media: DataFrame, dim: int = 8,
                     deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas over binary payloads -> fixed-dim feature vectors.
    Batch shape: one Arrow record batch of payloads in, one of feature
    arrays out — identical to what a real decoder would use."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload or b"")
                if not deterministic_fake:
                    decode_image(raw)  # raises: real decoder not shipped
                h = hashlib.sha256(raw).digest()
                vec = (np.frombuffer(h[:4 * dim], dtype=np.uint32)
                       .astype(np.float32) / np.float32(2**32))
                feats.append(vec.tolist())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(bytes(p or b"")) for p in pdf["payload"]],
                "feature": feats,
            })

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)
