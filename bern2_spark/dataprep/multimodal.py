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


# ------------------------------------------------- video frame sampling

VIDEO_SCHEMA = ("doc_id bigint, media_type string, duration_ms int, "
                "fps int, payload binary")
FRAME_SCHEMA = ("doc_id bigint, frame_idx int, ts_ms int, "
                "frame_hash string, feature array<float>")


def decode_video(payload: bytes):
    """Real decode would go through PyAV/ffmpeg here."""
    raise NotImplementedError(
        "video decode requires ffmpeg bindings not present in this "
        "environment; use sample_frames(deterministic_fake=True) for "
        "the plumbing path")


def attach_fake_video(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture: deterministic per-doc 'video' — 1-5 s duration
    derived from n_chars, payload from the text prefix."""
    return docs.select(
        "doc_id",
        F.lit("video/mp4").alias("media_type"),
        ((1 + F.length(F.col(text_col)) % 5) * 1000).cast("int")
        .alias("duration_ms"),
        F.lit(30).alias("fps"),
        F.encode(F.substring(F.col(text_col), 1, 256), "utf-8")
        .alias("payload"))


def sample_frames(media: DataFrame, sample_fps: int = 1, dim: int = 4,
                  deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas over video payloads -> one row per sampled frame
    (``sample_fps`` frames per second of duration).  Row explosion
    happens INSIDE the Arrow batch — a real decoder emits frames the
    same way (pyav demux loop per payload, one output batch per input
    batch), so schema, batch shape, and the per-frame feature slot are
    production-real; only the pixel decode is faked (sha256 of
    payload:frame_idx stands in for the frame bytes)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "ts_ms": [],
                   "frame_hash": [], "feature": []}
            for doc_id, dur, payload in zip(pdf["doc_id"],
                                            pdf["duration_ms"],
                                            pdf["payload"]):
                raw = bytes(payload or b"")
                if not deterministic_fake:
                    decode_video(raw)  # raises: no decoder shipped
                n = int(dur) * sample_fps // 1000
                for i in range(n):
                    h = hashlib.sha256(
                        raw + b":" + str(i).encode()).hexdigest()
                    vec = (np.frombuffer(
                        bytes.fromhex(h)[:4 * dim], dtype=np.uint32)
                        .astype(np.float32) / np.float32(2**32))
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * 1000 // sample_fps)
                    out["frame_hash"].append(h)
                    out["feature"].append(vec.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=FRAME_SCHEMA)


# ---------------------------------------------------- audio windowing

AUDIO_SCHEMA = ("doc_id bigint, media_type string, sample_rate int, "
                "n_samples int, payload binary")
AUDIO_WINDOW_SCHEMA = ("doc_id bigint, window_idx int, start_sample int, "
                       "window_hash string, rms double")


def decode_audio(payload: bytes):
    """Real decode would go through soundfile/librosa here."""
    raise NotImplementedError(
        "audio decode requires an audio library not present in this "
        "environment; use window_audio(deterministic_fake=True) for "
        "the plumbing path")


def attach_fake_audio(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture: deterministic per-doc 'audio' — 16 kHz, 1-7
    4096-sample blocks derived from n_chars, payload from the text
    prefix (the same discipline as attach_fake_video)."""
    return docs.select(
        "doc_id",
        F.lit("audio/wav").alias("media_type"),
        F.lit(16000).alias("sample_rate"),
        ((1 + F.length(F.col(text_col)) % 7) * 4096).cast("int")
        .alias("n_samples"),
        F.encode(F.substring(F.col(text_col), 1, 256), "utf-8")
        .alias("payload"))


def window_audio(media: DataFrame, window_samples: int = 4096,
                 deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas over audio payloads -> one row per analysis window
    (tumbling ``window_samples`` blocks over the declared sample
    count) with a per-window feature slot — the exact shape a real
    frontend (RMS/VAD/fbank per window) produces: the window
    explosion happens INSIDE the Arrow batch, one output batch per
    input batch, so schema, partitioning, and batch geometry are
    production-real.  Only the PCM decode is faked (sha256 of
    payload:window_idx stands in for the samples; the fake 'rms' is
    the hash's leading uint32 scaled to [0,1) — exact in float64 on
    any engine)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "window_idx": [], "start_sample": [],
                   "window_hash": [], "rms": []}
            for doc_id, n_samples, payload in zip(pdf["doc_id"],
                                                  pdf["n_samples"],
                                                  pdf["payload"]):
                raw = bytes(payload or b"")
                if not deterministic_fake:
                    decode_audio(raw)  # raises: no decoder shipped
                n_win = int(n_samples) // window_samples
                for i in range(n_win):
                    h = hashlib.sha256(
                        raw + b":" + str(i).encode()).hexdigest()
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(i)
                    out["start_sample"].append(i * window_samples)
                    out["window_hash"].append(h)
                    out["rms"].append(
                        float(np.uint32(int(h[:8], 16)) / np.float64(2**32)))
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=AUDIO_WINDOW_SCHEMA)
